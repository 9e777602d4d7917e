"""CenterPoint-style BEV detection head.

Private BEV trunk (ResNet-18 variant, no maxpool) + SECONDFPN neck + shared
conv + per-task separate branches. fp32 by default (the reference guards it
with @autocast(False): /root/reference/layers/heads/bev_height_head.py:85);
`dtype=bf16` is an opt-in serving approximation (outputs are cast back to
fp32) — the head's convs are HBM-bandwidth-bound on TPU, so halving bytes
nearly halves the stage time.

Reference parity target: /root/reference/layers/heads/bev_height_head.py:31-111
plus mmdet3d CenterHead/SeparateHead semantics (external dep of the ref).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sgv3d_tpu.config import HeadConfig
from sgv3d_tpu.nn.blocks import ConvBNReLU, SeparateTaskBranch
from sgv3d_tpu.nn.resnet import ResNet
from sgv3d_tpu.nn.second_fpn import SECONDFPN


class BEVHeightHead(nn.Module):
    cfg: HeadConfig
    dtype: jnp.dtype | None = None  # None = fp32 (parity default)

    @nn.compact
    def __call__(self, bev, train: bool):
        """bev: (B, Y, X, C) BEV features.

        Returns: list over tasks of dicts with keys
          reg (B, H, W, 2), height (B, H, W, 1), dim (B, H, W, 3),
          rot (B, H, W, 2), vel (B, H, W, 2), heatmap (B, H, W, num_cls) —
          always fp32 regardless of the compute dtype.
        """
        cfg = self.cfg
        bev = bev.astype(self.dtype or jnp.float32)
        trunk = ResNet(18, base_channels=cfg.bev_backbone_base_channels,
                       num_stages=3, strides=(1, 2, 2), out_indices=(0, 1, 2),
                       with_maxpool=False, dtype=self.dtype, name="trunk")
        neck = SECONDFPN(cfg.bev_neck_out_channels,
                         cfg.bev_neck_upsample_strides, dtype=self.dtype,
                         name="neck")
        # The neck consumes [bev_input] + trunk stage outputs.
        feats = [bev] + trunk(bev, train)
        x = neck(feats, train)
        x = ConvBNReLU(cfg.share_conv_channels, 3, dtype=self.dtype,
                       name="shared_conv")(x, train)

        outs = []
        for ti, task in enumerate(cfg.tasks):
            task_out = {}
            for head_name, (out_ch, num_conv) in cfg.common_heads:
                task_out[head_name] = SeparateTaskBranch(
                    out_ch, num_conv=num_conv,
                    final_kernel=cfg.final_kernel, dtype=self.dtype,
                    name=f"task{ti}_{head_name}")(x, train).astype(jnp.float32)
            task_out["heatmap"] = SeparateTaskBranch(
                task.num_classes, num_conv=2, final_kernel=cfg.final_kernel,
                init_bias=cfg.init_bias, dtype=self.dtype,
                name=f"task{ti}_heatmap")(x, train).astype(jnp.float32)
            outs.append(task_out)
        return outs
