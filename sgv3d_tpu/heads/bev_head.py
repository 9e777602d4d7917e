"""CenterPoint-style BEV detection head.

Private BEV trunk (ResNet-18 variant, no maxpool) + SECONDFPN neck + shared
conv + per-task separate branches. Always fp32 (the reference guards it with
@autocast(False): /root/reference/layers/heads/bev_height_head.py:85).

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

    @nn.compact
    def __call__(self, bev, train: bool):
        """bev: (B, Y, X, C) fp32 BEV features.

        Returns: list over tasks of dicts with keys
          reg (B, H, W, 2), height (B, H, W, 1), dim (B, H, W, 3),
          rot (B, H, W, 2), vel (B, H, W, 2), heatmap (B, H, W, num_cls).
        """
        cfg = self.cfg
        bev = bev.astype(jnp.float32)
        trunk = ResNet(18, base_channels=cfg.bev_backbone_base_channels,
                       num_stages=3, strides=(1, 2, 2), out_indices=(0, 1, 2),
                       with_maxpool=False, name="trunk")
        neck = SECONDFPN(cfg.bev_neck_out_channels,
                         cfg.bev_neck_upsample_strides, name="neck")
        # The neck consumes [bev_input] + trunk stage outputs.
        feats = [bev] + trunk(bev, train)
        x = neck(feats, train)
        x = ConvBNReLU(cfg.share_conv_channels, 3, name="shared_conv")(x, train)

        outs = []
        for ti, task in enumerate(cfg.tasks):
            task_out = {}
            for head_name, (out_ch, num_conv) in cfg.common_heads:
                task_out[head_name] = SeparateTaskBranch(
                    out_ch, num_conv=num_conv,
                    final_kernel=cfg.final_kernel,
                    name=f"task{ti}_{head_name}")(x, train)
            task_out["heatmap"] = SeparateTaskBranch(
                task.num_classes, num_conv=2, final_kernel=cfg.final_kernel,
                init_bias=cfg.init_bias, name=f"task{ti}_heatmap")(x, train)
            outs.append(task_out)
        return outs
