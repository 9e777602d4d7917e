"""User-facing inference API, drop-in shaped like the reference model.

The reference's `BEVHeight(...).forward(sweep_imgs, mats_dict)` takes NCHW
images (B, num_sweeps, num_cams, 3, H, W) and a dict of 4x4 mats, and
`get_bboxes` returns per-sample [boxes9, scores, labels]
(/root/reference/models/bev_height.py:42-126). `BEVHeightPredictor` keeps that
surface: NCHW in, per-sample numpy detections out, jit under the hood.
"""
from __future__ import annotations

from typing import Any, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.config import ExpConfig
from sgv3d_tpu.decode import decode
from sgv3d_tpu.models.bev_height import BEVHeight


class BEVHeightPredictor:
    """Jit-compiled end-to-end inference: images + calib -> 3D boxes.

    `static_rig` (default True) caches the lift geometry (frustum -> ego ->
    BEV cell indices) per distinct calibration, recomputing only when the
    mats change — roadside cameras are fixed, so in steady state every frame
    skips the geometry stage entirely (`nn.lss_fpn.compute_lift_cells`).
    Exact: the cache key is the calibration bytes, so results are identical
    to recomputing (tested); set static_rig=False to force in-graph
    geometry every call.
    """

    def __init__(self, cfg: ExpConfig, variables: Mapping[str, Any],
                 use_bf16: bool = True, static_rig: bool = True,
                 bf16_head: bool = False, mesh=None,
                 fused_convs: bool | None = None,
                 cull_pixels: bool | None = None):
        """`bf16_head` additionally runs the BEV head's convs in bf16
        (fp32 outputs) — a serving approximation beyond the reference's
        autocast guards (which pin the head fp32), so it is opt-in.
        Measured e2e on v5e (round 4): +0.6% img/s only — below the bar to
        make it the default; the win the per-stage profile suggested is
        mostly recovered by XLA's fusions already.

        `fused_convs` (opt-in; requires use_bf16 on TPU, and keep it off
        under a mesh — pallas_call does not partition under GSPMD) runs the
        image backbone's identity-bottleneck stacks as fused Pallas kernels
        (ops/pallas_bottleneck.py) — same bf16 math, parity-tested.

        `mesh` (a `train.sharding.make_mesh` Mesh) turns on multi-chip
        serving: the batch is sharded over the mesh's `data` axis (params
        replicated, per-batch results gathered on fetch — batch size must be
        divisible by the data-axis size), and a 2-D `(data, bev)` mesh
        additionally shards the BEV map spatially (hybrid DP x SP, halo
        exchanges inserted by XLA). A 1-device mesh is treated as None —
        plain jit is faster there (see CLAUDE.md relay pitfall)."""
        from sgv3d_tpu.train.sharding import (
            batch_sharding, bev_sharding, replicated)

        self.cfg = cfg
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if fused_convs is None:
            # opt-in until the e2e win is measured; always off under a mesh
            # (a pallas_call has no GSPMD partitioning rules, so the sharded
            # serving graph would replicate its operands instead of staying
            # batch-sharded)
            fused_convs = False
        self.model = BEVHeight(
            cfg, dtype=jnp.bfloat16 if (use_bf16 and on_tpu) else None,
            head_dtype=jnp.bfloat16 if (bf16_head and on_tpu) else None,
            bev_sharding=(bev_sharding(self.mesh) if self.mesh is not None
                          else None),
            fused_convs=fused_convs)
        self.variables = variables
        self.static_rig = static_rig
        # Static-rig pixel culling (ops.voxel_pooling.cull_pixel_indices +
        # apply_pixel_cull): statically drop pixels whose whole height ray
        # is outside the BEV grid before the row-bound top-k + scatter
        # (+2.3% e2e img/s on r101, +5.2% SGV3D, PIXEL_CULL.json).
        # Identical top-k selection; the BEV map
        # differs only by fp32 scatter summation order (<=1.7e-6, probed
        # on-chip — tools/probe_pixel_cull.py). Only meaningful with the
        # per-rig cell cache + top-k lift; off under a mesh (the sharded
        # cells/gather layout is untested there). Each NEW rig recomputes
        # the validity mask on the host CPU backend (~1 s of pure geometry,
        # utils/host_compute.py — deliberately NO device->host fetch);
        # long-lived per-rig serving amortises it, set cull_pixels=False
        # for rapidly-changing calibrations.
        if cull_pixels is None:
            cull_pixels = (static_rig and self.mesh is None
                           and cfg.backbone.lift_top_k is not None)
        elif cull_pixels:
            # fail loudly on an explicit request the path cannot honour
            # instead of silently ignoring it or mis-gathering (review r5)
            if not static_rig or cfg.backbone.lift_top_k is None:
                raise ValueError(
                    "cull_pixels=True requires static_rig=True and a top-k "
                    "lift (cfg.backbone.lift_top_k)")
            if self.mesh is not None:
                raise ValueError(
                    "cull_pixels=True is unsupported under a mesh")
        self.cull_pixels = cull_pixels
        self._cells = None          # (cells, pix_keep or None) once cached
        self._cells_key = None

        def _infer(variables, imgs, mats, cells=None, pix_keep=None):
            preds, _ = self.model.apply(variables, imgs, mats, False,
                                        cells=cells, pix_keep=pix_keep)
            return decode(cfg.head, preds)

        def _cells_fn(mats):
            from sgv3d_tpu.nn.lss_fpn import compute_lift_cells
            return compute_lift_cells(cfg.backbone, mats)

        grid = cfg.backbone.voxel_grid
        self._num_cells = int(grid.voxel_num[0]) * int(grid.voxel_num[1])

        if self.mesh is None:
            # Commit the params to device ONCE: a msgpack-loaded tree is
            # host numpy (flax from_bytes), and passing it to the jitted
            # _infer re-uploads the full model EVERY call — seconds per
            # batch for r101 through a TPU relay (code review r5). A no-op
            # for already-device trees.
            self.variables = jax.device_put(self.variables)
            self._infer = jax.jit(_infer)
            self._cells_fn = jax.jit(_cells_fn)
            self._batch_sharding = None
        else:
            bs, rep = batch_sharding(self.mesh), replicated(self.mesh)
            # Commit the params to the replicated sharding ONCE — otherwise
            # jit's in_shardings finds the (numpy / single-device) tree
            # mismatched and silently re-replicates the whole thing across
            # the mesh on EVERY call (hundreds of MB per batch for r101).
            self.variables = jax.device_put(variables, rep)
            # pix_keep is always None under a mesh (culling is off there);
            # a None argument has no array leaves, so any sharding entry fits
            self._infer = jax.jit(_infer, in_shardings=(rep, bs, bs, bs, rep),
                                  out_shardings=bs)
            self._cells_fn = jax.jit(_cells_fn, in_shardings=(bs,),
                                     out_shardings=bs)
            self._batch_sharding = bs

    def _rig_cells(self, host_mats, jmats):
        """Cached lift cells, keyed on the HOST-side calibration bytes —
        keying on the device arrays would cost a device->host fetch per
        matrix per call (a full round-trip each on a TPU host)."""
        key = tuple(
            (k, np.asarray(host_mats[k]).tobytes())
            for k in ("sensor2ego_mats", "sensor2virtual_mats", "intrin_mats",
                      "ida_mats", "reference_heights", "bda_mat")
            if k in host_mats)
        if key != self._cells_key:
            cells = self._cells_fn(jmats)
            pix = None
            if self.cull_pixels:
                from sgv3d_tpu.ops.voxel_pooling import (
                    apply_pixel_cull, cull_pixel_indices)
                from sgv3d_tpu.utils.host_compute import host_valid_pixels
                # The validity mask is computed on the HOST CPU backend from
                # the host-side mats (pure geometry, conservative 1-voxel
                # margin): a device->host fetch of anything through a TPU
                # relay can cost minutes on a cold path. Once per rig; the
                # lift still consumes the DEVICE-computed cells for every
                # kept pixel.
                valid = host_valid_pixels(self.cfg.backbone, host_mats)
                out = cull_pixel_indices(valid) if valid is not None else None
                if out is not None:
                    pix_np, n_valid = out
                    pix = jnp.asarray(pix_np)
                    cells = apply_pixel_cull(cells, pix, n_valid,
                                             self._num_cells)
            self._cells = (cells, pix)
            self._cells_key = key
        return self._cells

    def _dispatch(self, sweep_imgs: np.ndarray,
                  mats_dict: Mapping[str, np.ndarray]):
        """Enqueue one batch on device; returns the (async) detections."""
        imgs = np.asarray(sweep_imgs)
        if imgs.shape[3] == 3 and imgs.shape[-1] != 3:
            imgs = np.transpose(imgs, (0, 1, 2, 4, 5, 3))  # NCHW -> NHWC
        if self._batch_sharding is not None:
            # place each host shard directly on its devices (no gather onto
            # one chip first)
            imgs = jax.device_put(imgs, self._batch_sharding)
            jmats = {k: jax.device_put(np.asarray(v), self._batch_sharding)
                     for k, v in mats_dict.items()}
        else:
            imgs = jnp.asarray(imgs)
            jmats = {k: jnp.asarray(v) for k, v in mats_dict.items()}
        cells, pix_keep = (self._rig_cells(mats_dict, jmats)
                           if self.static_rig else (None, None))
        return self._infer(self.variables, imgs, jmats, cells, pix_keep)

    @staticmethod
    def _collect(dets) -> List[list]:
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        labels = np.asarray(dets.labels)
        valid = np.asarray(dets.valid)
        return [[boxes[i][valid[i]], scores[i][valid[i]], labels[i][valid[i]]]
                for i in range(boxes.shape[0])]

    def __call__(self, sweep_imgs: np.ndarray,
                 mats_dict: Mapping[str, np.ndarray]) -> List[list]:
        """sweep_imgs: (B, S, N, 3, H, W) NCHW (reference convention) or
        (B, S, N, H, W, 3) NHWC; fp32 normalized or raw uint8 (normalized
        on-device). Returns per-sample
        [boxes (M, 9), scores (M,), labels (M,)] numpy arrays."""
        return self._collect(self._dispatch(sweep_imgs, mats_dict))

    def stream(self, batches):
        """Software-pipelined serving over an iterable of
        (sweep_imgs, mats_dict): dispatches batch i, then fetches batch
        i-1's detections while i computes on device, overlapping the host
        readback with the next batch's compute (+32% measured batch-8
        throughput on v5e, tools/probe_bench_overlap.py). Yields the same
        per-batch results as sequential `__call__`s."""
        from sgv3d_tpu.utils.pipeline import pipelined
        yield from pipelined(batches, lambda b: self._dispatch(*b),
                             self._collect)


def load_variables(cfg: ExpConfig, ckpt_path: str) -> Mapping[str, Any]:
    """Model variables from either an orbax checkpoint DIRECTORY (training
    output) or a flax-msgpack FILE (tools/convert_weights.py output)."""
    import os

    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.train.loop import create_train_state
    from sgv3d_tpu.train.optim import make_optimizer

    model = BEVHeight(cfg)
    tx, _ = make_optimizer(cfg, 1, 1)
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=1)
    state = create_train_state(model, cfg, tx, (imgs, mats))
    template = {"params": state.params, "batch_stats": state.batch_stats}
    if os.path.isfile(ckpt_path):
        from flax.serialization import from_bytes
        with open(ckpt_path, "rb") as f:
            return from_bytes(template, f.read())
    from sgv3d_tpu.train.checkpoint import CheckpointManager
    state = CheckpointManager(ckpt_path).restore(state)
    return {"params": state.params, "batch_stats": state.batch_stats}


def load_predictor(cfg: ExpConfig, ckpt_path: str,
                   **predictor_kwargs) -> BEVHeightPredictor:
    """Build a predictor from an orbax checkpoint dir or a msgpack file."""
    return BEVHeightPredictor(cfg, load_variables(cfg, ckpt_path),
                              **predictor_kwargs)
