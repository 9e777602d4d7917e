"""SECONDFPN neck (flax.linen, NHWC).

Each input level is resampled to a common stride — ConvTranspose for
upsample_strides >= 1, strided conv for fractional strides — then BN(eps 1e-3)
+ ReLU, and all levels are channel-concatenated.

Reference conf sites: /root/reference/exps/sgv3d/...r50...py:62-68 (image neck,
strides [0.25, 0.5, 1, 2]) and :98-101 (BEV neck, strides [1, 2, 4, 8]);
implementation semantics follow mmdet3d SECONDFPN (external dep of the ref).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.nn.blocks import conv


class SECONDFPN(nn.Module):
    out_channels: Sequence[int]
    upsample_strides: Sequence[float]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats, train: bool):
        assert len(feats) == len(self.out_channels) == len(self.upsample_strides)
        outs = []
        for i, (x, out_ch, stride) in enumerate(
                zip(feats, self.out_channels, self.upsample_strides)):
            if stride >= 1:
                s = int(round(stride))
                y = nn.ConvTranspose(
                    out_ch, (s, s), strides=(s, s), padding="VALID",
                    dtype=self.dtype, name=f"deblock{i}_deconv")(x)
            else:
                s = int(round(1.0 / stride))
                y = conv(out_ch, s, s, padding=0, dtype=self.dtype,
                         name=f"deblock{i}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"deblock{i}_bn")(y)
            outs.append(nn.relu(y))
        return jnp.concatenate(outs, axis=-1)
