"""ResNet backbone (flax.linen, NHWC) — torchvision/mmdet weight-compatible.

Supports the three configurations the framework needs:
  * image backbones: ResNet-50/101, 7x7 stem + maxpool, 4 bottleneck stages
    (reference conf: /root/reference/exps/sgv3d/...r50...py:54-61)
  * BEV trunk: ResNet-18 variant with in_channels/base_channels overrides,
    3 stages, strides (1, 2, 2), no maxpool
    (reference conf: /root/reference/exps/sgv3d/...r50...py:86-96 and
     /root/reference/layers/heads/bev_height_head.py:96-108)
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.nn.blocks import BasicBlock, conv

STAGE_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck, pytorch-style stride on 3x3."""
    planes: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)
        identity = x
        out = conv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, 3, self.stride, use_bias=False, dtype=self.dtype,
                   name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                   name="conv3")(out)
        out = bn("bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            identity = conv(self.planes * 4, 1, self.stride, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    depth: int
    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    with_maxpool: bool = True
    dtype: jnp.dtype | None = None
    # Serving fast path: run each stage's identity-bottleneck run as fused
    # Pallas kernels (ops/pallas_bottleneck.py) — inference only (BN folded
    # into conv weights), bf16 only. Param tree is unchanged: the fused path
    # reads the same conv/bn params the unfused modules would.
    fused: bool = False

    def _fused_identity_run(self, x, stage: int, first_block: int,
                            num_blocks: int):
        from sgv3d_tpu.ops.pallas_bottleneck import (
            fold_bottleneck_params, fused_bottleneck_stack)
        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        folded = []
        for i in range(first_block, num_blocks):
            name = f"layer{stage + 1}_block{i}"
            folded.append(fold_bottleneck_params(params[name], stats[name]))
        return fused_bottleneck_stack(x, folded)

    @nn.compact
    def __call__(self, x, train: bool):
        use_bottleneck = self.depth >= 50
        blocks = STAGE_BLOCKS[self.depth][: self.num_stages]
        use_fused = (self.fused and use_bottleneck and not train
                     and not self.is_initializing()
                     and self.dtype == jnp.bfloat16)

        x = conv(self.base_channels, 7, 2, use_bias=False, dtype=self.dtype,
                 name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        if self.with_maxpool:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for stage, (num_blocks, stride) in enumerate(zip(blocks, self.strides)):
            planes = self.base_channels * (2 ** stage)
            b = 0
            while b < num_blocks:
                s = stride if b == 0 else 1
                if (use_fused and s == 1 and x.shape[-1] == planes * 4):
                    # every remaining block of the stage is a stride-1
                    # identity bottleneck: one fused Pallas run
                    x = self._fused_identity_run(x, stage, b, num_blocks)
                    b = num_blocks
                elif use_bottleneck:
                    x = Bottleneck(planes, s, dtype=self.dtype,
                                   name=f"layer{stage + 1}_block{b}")(x, train)
                    b += 1
                else:
                    x = BasicBlock(planes, s, dtype=self.dtype,
                                   name=f"layer{stage + 1}_block{b}")(x, train)
                    b += 1
            if stage in self.out_indices:
                outs.append(x)
        return outs
