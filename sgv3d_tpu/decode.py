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


def decode(cfg: HeadConfig, preds: list) -> Detections:
    """Decode all task heads into a fixed-size detection set.

    All tasks are decoded in one batched pass: heatmaps are padded to the
    max per-task class count and stacked, so the 6 per-task TopK custom
    calls (the decode hot spot) collapse into a single (B, T, HW*ncmax)
    top-k, and the regression gathers / NMS vmap over the task axis. Output
    layout (task-major concatenation, post_max_size slots each) and numerics
    match the previous per-task implementation exactly.
    """
    t_n = len(cfg.tasks)
    ncs = [t.num_classes for t in cfg.tasks]
    nc_max = max(ncs)
    b, h, w, _ = preds[0]["heatmap"].shape
    k = min(cfg.max_per_task, h * w)  # per-task candidate count

    # (B, T, H*W, nc_max) heatmap logits, padded classes at -inf.
    hms = jnp.stack([
        jnp.pad(p["heatmap"].astype(jnp.float32).reshape(b, h * w, -1),
                ((0, 0), (0, 0), (0, nc_max - nc)),
                constant_values=-jnp.inf)
        for p, nc in zip(preds, ncs)], axis=1)
    hm = jax.nn.sigmoid(hms)

    scores, flat_idx = jax.lax.top_k(hm.reshape(b, t_n, -1), k)  # (B, T, k)
    cls = flat_idx % nc_max
    pos = flat_idx // nc_max
    ys = (pos // w).astype(jnp.float32)
    xs = (pos % w).astype(jnp.float32)

    def gather(name):
        t = jnp.stack([p[name].astype(jnp.float32) for p in preds], axis=1)
        c = t.shape[-1]
        return jnp.take_along_axis(
            t.reshape(b, t_n, h * w, c), pos[..., None], axis=2)

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

    radii = jnp.asarray(cfg.nms_min_radius, jnp.float32)       # (T,)
    offsets = jnp.asarray(
        [sum(ncs[:i]) for i in range(t_n)], jnp.int32)         # (T,)

    def per_task(boxes_s, scores_s, cls_s, valid_s, radius, offset):
        keep = circle_nms(boxes_s[:, :2], valid_s, radius)
        # Stable-sort kept-first (already score-ordered), take post_max_size.
        order = jnp.argsort(~keep, stable=True)[: cfg.post_max_size]
        n_keep = jnp.sum(keep)
        out_valid = jnp.arange(cfg.post_max_size) < n_keep
        return (boxes_s[order], scores_s[order] * out_valid,
                cls_s[order] + offset, out_valid)

    per_bt = jax.vmap(jax.vmap(per_task, in_axes=(0, 0, 0, 0, 0, 0)),
                      in_axes=(0, 0, 0, 0, None, None))
    boxes, scores, labels, valid = per_bt(
        boxes, scores, cls, valid, radii, offsets)  # (B, T, post_max, ...)

    pm = cfg.post_max_size
    return Detections(boxes.reshape(b, t_n * pm, 9),
                      scores.reshape(b, t_n * pm),
                      labels.reshape(b, t_n * pm),
                      valid.reshape(b, t_n * pm))
