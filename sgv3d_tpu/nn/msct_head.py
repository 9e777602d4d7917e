"""MSCThead: two-scale multi-task image head (height bins, semantic masks,
context) for the BSM (background-suppressed) backbone.

Reference parity target: /root/reference/layers/backbones/bsm_lss_fpn.py:214-320
(stage one at stride 16 -> TaskFPN upsample to stride 8 -> stage two), camera-
aware SE on both scales, ASPP on the coarse scale.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.nn.blocks import (
    ASPP, ConvBNReLU, Mlp, SELayer, TaskFPN, TaskHead, conv)

# NOTE: there is deliberately no flax `depth_head0` module — see the stage-one
# comment in __call__; its reference weights are dead and the converter skips
# `height_net.depth_head0.*` torch keys.


class MSCThead(nn.Module):
    mid_channels: tuple[int, int] = (512, 256)
    depth_channels: int = 90
    semantic_channels: int = 7
    context_channels: int = 80
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats, mlp_input, train: bool):
        """feats: [feat16 (BN, H16, W16, C0), feat8 (BN, H8, W8, C1)].
        Returns (depth1, semantic1, context1, semantic0):
          depth1    (BN, H8, W8, D)      stage-two height-bin logits
          semantic1 (BN, H8, W8, S)      stage-two semantic logits
          context1  (BN, H8, W8, Cctx)   stage-two context features
          semantic0 (BN, H16, W16, S)    stage-one semantic logits (aux loss)
        """
        m0, m1 = self.mid_channels
        mlp_input = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name="mlp_bn")(mlp_input)
        f0 = ConvBNReLU(m0, 3, dtype=self.dtype, name="reduce_conv0")(
            feats[0].astype(jnp.float32), train)
        f1 = ConvBNReLU(m1, 3, dtype=self.dtype, name="reduce_conv1")(
            feats[1].astype(jnp.float32), train)
        se0 = Mlp(m0, m0, name="scale0_mlp")(mlp_input)[:, None, None, :]
        se1 = Mlp(m1, m1, name="scale1_mlp")(mlp_input)[:, None, None, :]
        f0 = SELayer(m0, dtype=self.dtype, name="scale0_se")(f0, se0)
        f1 = SELayer(m1, dtype=self.dtype, name="scale1_se")(f1, se1)
        f0 = ASPP(m0, dtype=self.dtype, name="aspp")(f0, train)

        # Stage one (stride 16). The reference's `depth_head0` is a
        # TaskHead(with_head=False) called with the default return_feat=True,
        # whose forward returns its input UNCHANGED (the decoder params exist
        # in checkpoints but are never run and receive no gradient —
        # bsm_lss_fpn.py:195-201,306). Mirror that exactly: identity.
        depth_feat = f0
        semantic0, semantic_feat = TaskHead(
            m0, self.semantic_channels, dtype=self.dtype,
            name="semantic_head0")(f0, train)
        context_feat = ConvBNReLU(m0, 3, dtype=self.dtype,
                                  name="context_conv0")(f0, train)

        # Fuse with the fine scale (stride 8)
        depth_feat = TaskFPN(m1, dtype=self.dtype, name="depth_fpn")(depth_feat, f1)
        semantic_feat = TaskFPN(m1, dtype=self.dtype,
                                name="semantic_fpn")(semantic_feat, f1)
        context_feat = TaskFPN(m1, dtype=self.dtype,
                               name="context_fpn")(context_feat, f1)

        # Stage two (stride 8)
        depth1 = TaskHead(m1, self.depth_channels, dtype=self.dtype,
                          name="depth_head1")(depth_feat, train, return_feat=False)
        semantic1 = TaskHead(m1, self.semantic_channels, dtype=self.dtype,
                             name="semantic_head1")(semantic_feat, train,
                                                    return_feat=False)
        context1 = ConvBNReLU(m1, 3, dtype=self.dtype,
                              name="context_conv1a")(context_feat, train)
        context1 = conv(self.context_channels, 1, dtype=self.dtype,
                        name="context_conv1b")(context1)
        return depth1, semantic1, context1, semantic0
