"""HeightNet: per-pixel height-bin logits + context features, modulated by a
27-dim camera-awareness vector through SE gates.

Reference parity target: /root/reference/layers/backbones/lss_fpn.py:162-250
(reduce conv -> camera-aware SE -> context conv; height branch = 3 BasicBlocks
+ ASPP + DCN + 1x1).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.nn.blocks import ASPP, BasicBlock, ConvBNReLU, Mlp, SELayer, conv
from sgv3d_tpu.ops.dcn import DeformConv


class HeightNet(nn.Module):
    mid_channels: int
    context_channels: int
    height_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, mlp_input, train: bool):
        """x: (BN, fH, fW, Cin); mlp_input: (BN, 27). Returns (height_logits,
        context): (BN, fH, fW, D), (BN, fH, fW, Cctx)."""
        mid = self.mid_channels
        # BatchNorm1d(27) over the camera vector.
        mlp_input = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="mlp_bn")(mlp_input)
        x = ConvBNReLU(mid, 3, dtype=self.dtype, name="reduce_conv")(x, train)

        ctx_se = Mlp(mid, mid, name="context_mlp")(mlp_input)[:, None, None, :]
        context = SELayer(mid, dtype=self.dtype, name="context_se")(x, ctx_se)
        context = conv(self.context_channels, 1, dtype=self.dtype,
                       name="context_conv")(context)

        h_se = Mlp(mid, mid, name="height_mlp")(mlp_input)[:, None, None, :]
        h = SELayer(mid, dtype=self.dtype, name="height_se")(x, h_se)
        for i in range(3):
            h = BasicBlock(mid, dtype=self.dtype, name=f"height_block{i}")(h, train)
        h = ASPP(mid, dtype=self.dtype, name="aspp")(h, train)
        h = DeformConv(mid, kernel=3, groups=4, name="dcn")(h)
        height = conv(self.height_channels, 1, dtype=self.dtype,
                      name="height_layer")(h)
        return height, context
