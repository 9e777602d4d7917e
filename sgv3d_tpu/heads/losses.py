"""Detection losses: gaussian focal heatmap loss + masked weighted L1.

DDP-equivalence note: the reference normalises each GPU's local loss by the
cross-GPU mean of num_pos via `reduce_mean`
(/root/reference/layers/heads/bev_height_head.py:272-275,293-300). Under DDP
gradient averaging that algebra reduces exactly to `global_sum / global_count`
— which is what the global-batch pjit computation below produces natively, so
no explicit collective is needed (XLA inserts the psum when the batch is
sharded over the mesh).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from sgv3d_tpu.config import HeadConfig
from sgv3d_tpu.heads.targets import Targets


def clip_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def gaussian_focal_loss(pred_prob: jnp.ndarray, gaussian_target: jnp.ndarray,
                        alpha: float = 2.0, gamma: float = 4.0) -> jnp.ndarray:
    """Elementwise gaussian focal loss (mmdet semantics); pred is probability."""
    eps = 1e-12
    pos_weights = (gaussian_target == 1.0).astype(jnp.float32)
    neg_weights = jnp.power(1.0 - gaussian_target, gamma)
    pos_loss = -jnp.log(pred_prob + eps) * jnp.power(1 - pred_prob, alpha) * pos_weights
    neg_loss = -jnp.log(1 - pred_prob + eps) * jnp.power(pred_prob, alpha) * neg_weights
    return pos_loss + neg_loss


def head_loss(cfg: HeadConfig, targets: Targets, preds: list) -> tuple[jnp.ndarray, dict]:
    """Total detection loss over tasks.

    Args:
      cfg: head config.
      targets: from `get_targets`.
      preds: per-task dicts of NHWC maps (reg/height/dim/rot/vel/heatmap).

    Returns: (scalar loss, metrics dict).
    """
    total = jnp.float32(0.0)
    metrics = {}
    code_w = jnp.asarray(cfg.code_weights, jnp.float32)
    for ti, pred in enumerate(preds):
        hm_target = targets.heatmaps[ti]
        hm_pred = jnp.clip(
            1.0 / (1.0 + jnp.exp(-pred["heatmap"].astype(jnp.float32))),
            1e-4, 1.0 - 1e-4)
        num_pos = jnp.sum((hm_target == 1.0).astype(jnp.float32))
        cls_avg = jnp.maximum(num_pos, 1.0)
        loss_heatmap = jnp.sum(
            gaussian_focal_loss(hm_pred, hm_target)) / cls_avg

        # (B, H, W, 10) -> gather rows at target indices
        anno_pred = jnp.concatenate(
            [pred["reg"], pred["height"], pred["dim"], pred["rot"], pred["vel"]],
            axis=-1).astype(jnp.float32)
        b, h, w, c = anno_pred.shape
        flat = anno_pred.reshape(b, h * w, c)
        gathered = jnp.take_along_axis(
            flat, targets.inds[..., None].astype(jnp.int32), axis=1)

        mask = targets.masks[ti][..., None]  # (B, K, 1)
        target_box = targets.anno_boxes
        isnotnan = jnp.isfinite(target_box).astype(jnp.float32)
        weights = mask * isnotnan * code_w
        num = jnp.maximum(jnp.sum(targets.masks[ti]), 1e-4)
        loss_bbox = cfg.loss_bbox_weight * jnp.sum(
            jnp.abs(gathered - target_box) * weights) / num

        total = total + loss_heatmap + loss_bbox
        metrics[f"task{ti}/heatmap"] = loss_heatmap
        metrics[f"task{ti}/bbox"] = loss_bbox
    return total, metrics
