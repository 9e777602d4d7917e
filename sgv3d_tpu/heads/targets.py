"""CenterPoint target generation, vectorised for jit (fixed max_objs).

The reference builds targets with a Python loop over <=500 objects per sample
(/root/reference/layers/heads/bev_height_head.py:113-253). Here the gaussian
heatmap rendering is a `lax.scan` over padded object slots with a max-splat
into a (num_classes, H, W) carry, and the regression targets are computed for
all slots at once with validity masks. Object order inside a task does not
affect the loss (it sums over masked slots), so targets keep their original
slot positions instead of the reference's per-task re-packing.

Box layout (9-dim): [x, y, z, dx(w), dy(l), dz(h), yaw, vx, vy];
anno_box layout (10-dim): [off_x, off_y, z, log dims(3), sin yaw, cos yaw,
vx, vy] — matches reference :239-247.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgv3d_tpu.config import HeadConfig


class Targets(NamedTuple):
    heatmaps: list  # per task: (B, H, W, num_cls_t) fp32
    anno_boxes: jnp.ndarray  # (B, K, 10)
    inds: jnp.ndarray        # (B, K) int32 flat y*W + x
    masks: list              # per task: (B, K) fp32 validity


def gaussian_radius(det_size, min_overlap: float):
    """CornerNet radius: smallest gaussian radius keeping IoU >= min_overlap.

    det_size = (height, width) in feature-map cells. Vectorised jnp version of
    the standard three-case formula.
    """
    height, width = det_size
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def _splat_heatmap(centers, radii, class_ids, valid, num_classes, hw):
    """Max-splat gaussians onto (num_classes, H, W) via scan over objects."""
    h, w = hw
    ygrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xgrid = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def step(hm, obj):
        cx, cy, r, cls, ok = obj
        sigma = (2.0 * r + 1.0) / 6.0
        dx = xgrid - cx
        dy = ygrid - cy
        g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
        g = jnp.where(inside & (ok > 0), g, 0.0)
        cls_i = jnp.clip(cls.astype(jnp.int32), 0, num_classes - 1)
        return hm.at[cls_i].max(g), None

    init = jnp.zeros((num_classes, h, w), jnp.float32)
    objs = (centers[:, 0].astype(jnp.float32), centers[:, 1].astype(jnp.float32),
            radii.astype(jnp.float32), class_ids, valid)
    hm, _ = jax.lax.scan(step, init, objs)
    return hm


def get_targets(cfg: HeadConfig, gt_boxes: jnp.ndarray,
                gt_labels: jnp.ndarray) -> Targets:
    """Build CenterPoint training targets.

    Args:
      cfg: head config (tasks, grid, ranges).
      gt_boxes: (B, K, 9) padded ground-truth boxes.
      gt_labels: (B, K) int32 global class ids, -1 for padding.

    Returns: Targets with per-task heatmaps (NHWC) and per-task masks over the
    shared (B, K, 10) anno/ind tensors.
    """
    w_feat, h_feat = cfg.feature_map_size
    vx, vy = cfg.voxel_size[0], cfg.voxel_size[1]
    osf = cfg.out_size_factor
    pc = cfg.point_cloud_range

    b, k = gt_labels.shape
    boxes = gt_boxes.astype(jnp.float32)
    labels = gt_labels.astype(jnp.int32)
    is_real = labels >= 0

    width = boxes[..., 3] / (vx * osf)
    length = boxes[..., 4] / (vy * osf)
    size_ok = (width > 0) & (length > 0)
    radius = gaussian_radius((length, width), cfg.gaussian_overlap)
    radius = jnp.maximum(float(cfg.min_radius),
                         jnp.floor(radius).astype(jnp.float32))

    coor_x = (boxes[..., 0] - pc[0]) / (vx * osf)
    coor_y = (boxes[..., 1] - pc[1]) / (vy * osf)
    cx_i = coor_x.astype(jnp.int32)
    cy_i = coor_y.astype(jnp.int32)
    in_bounds = (cx_i >= 0) & (cx_i < w_feat) & (cy_i >= 0) & (cy_i < h_feat)
    valid = is_real & size_ok & in_bounds

    inds = jnp.clip(cy_i, 0, h_feat - 1) * w_feat + jnp.clip(cx_i, 0, w_feat - 1)
    anno = jnp.concatenate(
        [
            (coor_x - cx_i.astype(jnp.float32))[..., None],
            (coor_y - cy_i.astype(jnp.float32))[..., None],
            boxes[..., 2:3],
            jnp.log(jnp.maximum(boxes[..., 3:6], 1e-8)),
            jnp.sin(boxes[..., 6:7]),
            jnp.cos(boxes[..., 6:7]),
            boxes[..., 7:9],
        ],
        axis=-1,
    )

    # One global heatmap over all classes (classes are disjoint across tasks),
    # then slice per task.
    total_classes = sum(t.num_classes for t in cfg.tasks)
    centers = jnp.stack([cx_i, cy_i], axis=-1)

    def per_sample(c, r, cls, ok):
        return _splat_heatmap(c, r, cls, ok.astype(jnp.float32),
                              total_classes, (h_feat, w_feat))

    hm_all = jax.vmap(per_sample)(centers, radius, labels, valid)  # (B, C, H, W)

    heatmaps, masks = [], []
    offset = 0
    for task in cfg.tasks:
        nc = task.num_classes
        heatmaps.append(hm_all[:, offset:offset + nc].transpose(0, 2, 3, 1))
        in_task = (labels >= offset) & (labels < offset + nc)
        masks.append((valid & in_task).astype(jnp.float32))
        offset += nc

    return Targets(heatmaps=heatmaps, anno_boxes=anno,
                   inds=inds.astype(jnp.int32), masks=masks)
