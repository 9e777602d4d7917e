"""CenterPoint box decoding + circle NMS, fully jit-safe (static shapes).

Dynamic-shape-free formulation of mmdet3d's CenterPointBBoxCoder.decode +
circle_nms (configured at /root/reference/exps/sgv3d/...r50...py:131-166):
fixed top-K per task, validity masks instead of filtering, O(K^2) pairwise
suppression via fori_loop, fixed post_max_size padding.

Output boxes are 9-dim [x, y, z_bottom, dx, dy, dz, yaw, vx, vy] (z shifted to
the box bottom as in mmdet3d CenterHead.get_bboxes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgv3d_tpu.config import HeadConfig


class Detections(NamedTuple):
    boxes: jnp.ndarray   # (B, T*post_max, 9)
    scores: jnp.ndarray  # (B, T*post_max)
    labels: jnp.ndarray  # (B, T*post_max) global class ids
    valid: jnp.ndarray   # (B, T*post_max) bool


def circle_nms(centers: jnp.ndarray, valid: jnp.ndarray,
               min_radius: float) -> jnp.ndarray:
    """Greedy circular suppression over score-ordered candidates.

    Args:
      centers: (K, 2) xy in BEV metres, ordered by descending score.
      valid: (K,) bool pre-validity.
      min_radius: suppression radius for this task.

    Returns: (K,) bool keep mask.
    """
    k = centers.shape[0]
    d2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    r2 = jnp.float32(min_radius) ** 2
    idx = jnp.arange(k)

    def body(i, keep):
        suppress = (d2[i] < r2) & (idx > i) & keep[i] & valid[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


def _decode_task(cfg: HeadConfig, pred: dict, class_offset: int,
                 nms_radius: float):
    """Decode one task head. Returns per-sample arrays of size post_max_size."""
    hm = jax.nn.sigmoid(pred["heatmap"].astype(jnp.float32))
    b, h, w, nc = hm.shape
    k = min(cfg.max_per_task, h * w * nc)

    scores, flat_idx = jax.lax.top_k(hm.reshape(b, h * w * nc), k)
    cls = flat_idx % nc
    pos = flat_idx // nc
    ys = (pos // w).astype(jnp.float32)
    xs = (pos % w).astype(jnp.float32)

    def gather(name):
        t = pred[name].astype(jnp.float32)
        c = t.shape[-1]
        return jnp.take_along_axis(
            t.reshape(b, h * w, c), pos[..., None], axis=1)

    reg = gather("reg")
    height = gather("height")[..., 0]
    dim = jnp.exp(gather("dim"))
    rot = gather("rot")
    vel = gather("vel")

    osf = float(cfg.out_size_factor)
    vx, vy = cfg.voxel_size[0], cfg.voxel_size[1]
    pc = cfg.point_cloud_range
    x = (xs + reg[..., 0]) * osf * vx + pc[0]
    y = (ys + reg[..., 1]) * osf * vy + pc[1]
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])

    pcr = cfg.post_center_range
    valid = (scores > cfg.score_threshold)
    valid &= (x >= pcr[0]) & (y >= pcr[1]) & (height >= pcr[2])
    valid &= (x <= pcr[3]) & (y <= pcr[4]) & (height <= pcr[5])

    boxes = jnp.stack(
        [x, y, height - dim[..., 2] * 0.5, dim[..., 0], dim[..., 1],
         dim[..., 2], yaw, vel[..., 0], vel[..., 1]], axis=-1)

    def per_sample(boxes_s, scores_s, cls_s, valid_s):
        keep = circle_nms(boxes_s[:, :2], valid_s, nms_radius)
        # Stable-sort kept-first (already score-ordered), take post_max_size.
        order = jnp.argsort(~keep, stable=True)[: cfg.post_max_size]
        n_keep = jnp.sum(keep)
        out_valid = jnp.arange(cfg.post_max_size) < n_keep
        return (boxes_s[order], scores_s[order] * out_valid,
                cls_s[order] + class_offset, out_valid)

    return jax.vmap(per_sample)(boxes, scores, cls, valid)


def decode(cfg: HeadConfig, preds: list) -> Detections:
    """Decode all task heads into a fixed-size detection set."""
    outs = []
    offset = 0
    for ti, task in enumerate(cfg.tasks):
        outs.append(_decode_task(cfg, preds[ti], offset,
                                 float(cfg.nms_min_radius[ti])))
        offset += task.num_classes
    boxes = jnp.concatenate([o[0] for o in outs], axis=1)
    scores = jnp.concatenate([o[1] for o in outs], axis=1)
    labels = jnp.concatenate([o[2] for o in outs], axis=1)
    valid = jnp.concatenate([o[3] for o in outs], axis=1)
    return Detections(boxes, scores, labels, valid)
