"""Image -> BEV backbones: LSSFPN (BEVHeight) and BSMLSSFPN (SGV3D).

TPU-first design notes vs the reference
(/root/reference/layers/backbones/lss_fpn.py:253-550, bsm_lss_fpn.py:322-614):
  * NHWC layouts end-to-end; convs run in an optional compute dtype (bf16)
    while geometry, softmax and pooling stay fp32 (mirrors the reference's
    autocast(False) guards).
  * The lift ("height ⊗ context") and splat (voxel pooling) are fused in
    `lift_splat_pool` — the (B, C, D, fH, fW) tensor the reference
    materialises never exists here.
  * Geometry is computed in-graph from the static frustum; no host sync.
"""
from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgv3d_tpu import geom
from sgv3d_tpu.config import BackboneConfig
from sgv3d_tpu.nn.blocks import conv
from sgv3d_tpu.nn.height_net import HeightNet
from sgv3d_tpu.nn.msct_head import MSCThead
from sgv3d_tpu.nn.resnet import ResNet
from sgv3d_tpu.nn.second_fpn import SECONDFPN
from sgv3d_tpu.ops.voxel_pooling import flatten_voxel_index, lift_splat_pool


def _lift_k(cfg: BackboneConfig, train: bool) -> int | None:
    """The active top-k lift knob: `lift_top_k` at eval (deploy default),
    `train_lift_top_k` during training (opt-in approximation, see config)."""
    return cfg.train_lift_top_k if train else cfg.lift_top_k


def _frustum_voxels(cfg: BackboneConfig, mats, sweep: int,
                    hwd_layout: bool) -> jnp.ndarray:
    """Shared geometry preamble: frustum -> ego points -> int voxel coords.

    `hwd_layout` orders the frustum (fH, fW, D, 4) (the top-k lift layout);
    otherwise (D, fH, fW, 4). Single implementation so the lift cells and
    the cull validity mask can never disagree on the geometry
    (code review r5)."""
    frustum = jnp.asarray(
        geom.make_frustum(cfg.final_dim, cfg.effective_downsample, cfg.d_bound))
    if hwd_layout:
        frustum = frustum.transpose(1, 2, 0, 3)        # (fH, fW, D, 4)
    points = geom.get_geometry(
        frustum,
        mats["sensor2ego_mats"][:, sweep],
        mats["sensor2virtual_mats"][:, sweep],
        mats["intrin_mats"][:, sweep],
        mats["ida_mats"][:, sweep],
        mats["reference_heights"][:, sweep],
        mats.get("bda_mat"),
    )
    return geom.geometry_to_voxel(points, cfg.voxel_grid)


def compute_lift_cells(cfg: BackboneConfig, mats, sweep: int = 0,
                       train: bool = False) -> jnp.ndarray:
    """BEV cell index for every frustum point: geometry -> voxelize -> flatten.

    Returns (BN, HW, D) int32 in eval top-k mode (the layout
    `topk_lift_inputs_hwd` consumes — an (fH, fW, D)-ordered frustum makes
    geometry emit it transpose-free) or (B, N, D, fH, fW) otherwise.

    Depends only on the calibration matrices, so for a static roadside rig
    it can be computed ONCE and reused for every frame
    (api.BEVHeightPredictor(static_rig=True)).
    """
    b = mats["sensor2ego_mats"].shape[0]
    n = mats["sensor2ego_mats"].shape[2]
    f_h, f_w = cfg.feat_hw
    d = cfg.num_height_bins
    grid = cfg.voxel_grid
    use_topk = _lift_k(cfg, train) is not None
    vox = _frustum_voxels(cfg, mats, sweep, hwd_layout=use_topk)
    cell = flatten_voxel_index(vox, tuple(grid.voxel_num))
    if use_topk:
        return cell.reshape(b * n, f_h * f_w, d)
    return cell


def compute_valid_pixels(cfg: BackboneConfig, mats, sweep: int = 0,
                         margin: int = 1) -> jnp.ndarray:
    """(BN, HW) bool: pixel has ANY height bin whose voxel coordinate lies
    within the BEV grid expanded by `margin` voxels on every axis.

    Drives the static-rig pixel cull (`ops.voxel_pooling.cull_pixel_indices`).
    Designed to run on the HOST CPU jax backend from host-side mats — pure
    geometry, no device round trip (fetching anything off a TPU relay can
    cost minutes, CLAUDE.md landmine 1). The margin makes the decision
    conservative across backends: a pixel is culled only when every bin
    misses the grid by more than `margin` voxels, so fp32 rounding skew
    between the CPU decision and the TPU lift cells cannot cull a pixel the
    TPU would keep (both sides force float32 matmul precision; skew is ULPs,
    the margin is a whole voxel).
    """
    b = mats["sensor2ego_mats"].shape[0]
    n = mats["sensor2ego_mats"].shape[2]
    grid = cfg.voxel_grid
    vox = _frustum_voxels(cfg, mats, sweep, hwd_layout=True)
    nums = jnp.asarray(
        [int(grid.voxel_num[0]), int(grid.voxel_num[1]), int(grid.voxel_num[2])],
        jnp.int32)
    ok = ((vox >= -margin) & (vox < nums + margin)).all(axis=-1)
    return ok.any(axis=-1).reshape(b * n, -1)              # (BN, fH*fW)


def _lift_and_splat(cfg: BackboneConfig, height_prob, tran_feat, mats, sweep,
                    train: bool = False, cells=None, pix_keep=None):
    """Shared geometry + fused pooling. height_prob (BN, fH, fW, D),
    tran_feat (BN, fH, fW, C) -> (B, Y, X, C) fp32.

    In eval mode, `cfg.lift_top_k` pools only the top-k height bins per pixel
    (measured on TPU: the exact 90-bin scatter is ~59 ms/batch-8 net, top-16
    ~20 ms — see tools/profile_topk.py). Training pools all bins by default
    so gradients reach every height bin, like the reference;
    `cfg.train_lift_top_k` opts into a top-k training lift (differentiable
    via lax.top_k — unselected bins get zero height gradient). `cells`
    (optional) is a precomputed `compute_lift_cells` result (static-rig
    fast path). `pix_keep` (optional, top-k path only, requires `cells`
    already culled via `ops.voxel_pooling.cull_pixel_indices` +
    `apply_pixel_cull`) statically drops fully-out-of-grid pixels before
    the row-bound top-k + scatter. Equivalence (tools/probe_pixel_cull.py):
    the top-k selection is bit-identical per kept pixel; the pooled BEV map
    is bitwise equal on CPU and differs on TPU only by fp32 scatter
    summation order (<=1.7e-6 — XLA reassociates at different row counts;
    do NOT assert on-chip bitwise equality against the unculled path)."""
    b = mats["sensor2ego_mats"].shape[0]
    n = mats["sensor2ego_mats"].shape[2]
    f_h, f_w = cfg.feat_hw
    d = cfg.num_height_bins
    grid = cfg.voxel_grid
    num_y, num_x = int(grid.voxel_num[1]), int(grid.voxel_num[0])

    k = _lift_k(cfg, train)
    if pix_keep is not None and k is None:
        raise ValueError("pixel culling applies to the top-k lift only")
    cell = cells if cells is not None else compute_lift_cells(
        cfg, mats, sweep, train)

    ctx = tran_feat.astype(jnp.float32).reshape(b * n, f_h * f_w, -1)
    if k is not None:
        from sgv3d_tpu.ops.voxel_pooling import topk_lift_inputs_hwd
        hp_hwd = height_prob.astype(jnp.float32).reshape(b * n, f_h * f_w, d)
        if pix_keep is not None:
            # static-rig pixel culling: `cell` is already the culled
            # (BN, HWv, D) array; gather the per-frame rows to match
            if cells is None:
                raise ValueError("pix_keep requires precomputed culled cells")
            hp_hwd = jnp.take(hp_hwd, pix_keep, axis=1)
            ctx = jnp.take(ctx, pix_keep, axis=1)
        # Training needs the differentiable lax.top_k (the Pallas kernel is
        # forward-only); eval keeps the "auto" kernel choice.
        hp, cell = topk_lift_inputs_hwd(hp_hwd, cell, k,
                                        method="exact" if train else "auto")
    else:
        hp = height_prob.astype(jnp.float32).transpose(0, 3, 1, 2)
        hp = hp.reshape(b * n, d, f_h * f_w)
        cell = cell.reshape(b * n, d, f_h * f_w)
    bev = lift_splat_pool(hp, ctx, cell, b, num_y * num_x)
    return bev.reshape(b, num_y, num_x, -1)


class LSSFPN(nn.Module):
    """BEVHeight backbone: ResNet + SECONDFPN -> HeightNet -> lift-splat."""
    cfg: BackboneConfig
    dtype: jnp.dtype | None = None
    # Serving fast path: fused Pallas identity-bottleneck runs in the image
    # backbone (ops/pallas_bottleneck.py; inference + bf16 only).
    fused_convs: bool = False

    @nn.compact
    def __call__(self, sweep_imgs, mats: Mapping[str, Any], train: bool,
                 cells=None, pix_keep=None):
        """sweep_imgs: (B, S, N, H, W, 3). Returns bev (B, Y, X, C) fp32 and,
        in train-height mode, the (assist, assist) aux features pair.
        `cells`: optional precomputed `compute_lift_cells` for the key sweep
        (static-rig fast path; past sweeps always recompute). `pix_keep`:
        optional static pixel-culling indices paired with culled `cells`
        (see `_lift_and_splat`)."""
        cfg = self.cfg
        b, s, n = sweep_imgs.shape[:3]
        resnet_cls = (nn.remat(ResNet, static_argnums=(2,))
                      if (cfg.remat_backbone and train) else ResNet)
        backbone = resnet_cls(cfg.resnet_depth, out_indices=(0, 1, 2, 3),
                              dtype=self.dtype, fused=self.fused_convs,
                              name="img_backbone")
        neck = SECONDFPN(cfg.img_neck_out_channels, (0.25, 0.5, 1, 2),
                         dtype=self.dtype, name="img_neck")
        height_net = HeightNet(
            mid_channels=cfg.height_net_mid_channels[0],
            context_channels=cfg.output_channels,
            height_channels=cfg.num_height_bins,
            dtype=self.dtype, name="height_net")
        assist_layer = conv(256, 1, dtype=self.dtype, name="assist_layer")

        mlp_input = geom.camera_mlp_input(
            mats["intrin_mats"][:, 0], mats["ida_mats"][:, 0],
            mats["sensor2ego_mats"][:, 0], mats["bda_mat"])

        def single_sweep(sweep):
            imgs = sweep_imgs[:, sweep].reshape(
                b * n, *sweep_imgs.shape[3:]).astype(self.dtype or jnp.float32)
            feat = neck(backbone(imgs, train), train)     # (BN, fH, fW, 512)
            assist = assist_layer(feat)
            h_logits, context = height_net(feat, mlp_input, train)
            height = jax.nn.softmax(h_logits.astype(jnp.float32), axis=-1)
            bev = _lift_and_splat(cfg, height, context, mats, sweep, train,
                                  cells if sweep == 0 else None,
                                  pix_keep if sweep == 0 else None)
            return bev, assist

        bev, assist = single_sweep(0)
        maps = [bev]
        for sweep in range(1, s):
            maps.append(jax.lax.stop_gradient(single_sweep(sweep)[0]))
        out = jnp.concatenate(maps, axis=-1) if s > 1 else bev
        return out, (assist, assist)


class BSMLSSFPN(nn.Module):
    """SGV3D backbone: two-scale necks, MSCThead, background suppression."""
    cfg: BackboneConfig
    dtype: jnp.dtype | None = None
    bg_threshold: float = 0.45
    # see LSSFPN.fused_convs
    fused_convs: bool = False

    @nn.compact
    def __call__(self, sweep_imgs, mats: Mapping[str, Any], train: bool,
                 cells=None, pix_keep=None):
        """Returns bev (B, Y, X, C+S) fp32 and (semantic0, semantic1) logits.
        `cells`: optional precomputed `compute_lift_cells` (key sweep only);
        `pix_keep`: optional static pixel-culling indices paired with culled
        `cells` (see `_lift_and_splat`)."""
        cfg = self.cfg
        b, s, n = sweep_imgs.shape[:3]
        resnet_cls = (nn.remat(ResNet, static_argnums=(2,))
                      if (cfg.remat_backbone and train) else ResNet)
        backbone = resnet_cls(cfg.resnet_depth, out_indices=(0, 1, 2, 3),
                              dtype=self.dtype, fused=self.fused_convs,
                              name="img_backbone")
        neck16 = SECONDFPN(cfg.img_neck_out_channels, (0.25, 0.5, 1, 2),
                           dtype=self.dtype, name="img_neck_16")
        neck8 = SECONDFPN(cfg.img_neck_out_channels, (0.5, 1, 2, 4),
                          dtype=self.dtype, name="img_neck_8")
        msct = MSCThead(
            mid_channels=tuple(cfg.height_net_mid_channels),
            depth_channels=cfg.num_height_bins,
            semantic_channels=cfg.semantic_channels,
            context_channels=cfg.output_channels,
            dtype=self.dtype, name="height_net")

        mlp_input = geom.camera_mlp_input(
            mats["intrin_mats"][:, 0], mats["ida_mats"][:, 0],
            mats["sensor2ego_mats"][:, 0], mats["bda_mat"])

        def single_sweep(sweep):
            imgs = sweep_imgs[:, sweep].reshape(
                b * n, *sweep_imgs.shape[3:]).astype(self.dtype or jnp.float32)
            feats = backbone(imgs, train)
            f16 = neck16(feats, train)
            f8 = neck8(feats, train)
            depth1, semantic1, context1, semantic0 = msct(
                [f16, f8], mlp_input, train)
            height = jax.nn.softmax(depth1.astype(jnp.float32), axis=-1)
            semantic = jax.nn.softmax(semantic1.astype(jnp.float32), axis=-1)
            tran_feat = jnp.concatenate(
                [context1.astype(jnp.float32), semantic], axis=-1)
            # Background suppression: zero features where P(background) > thr.
            keep = (semantic[..., 0:1] <= self.bg_threshold).astype(jnp.float32)
            tran_feat = tran_feat * keep
            bev = _lift_and_splat(cfg, height, tran_feat, mats, sweep, train,
                                  cells if sweep == 0 else None,
                                  pix_keep if sweep == 0 else None)
            return bev, (semantic0, semantic1)

        bev, aux = single_sweep(0)
        maps = [bev]
        for sweep in range(1, s):
            maps.append(jax.lax.stop_gradient(single_sweep(sweep)[0]))
        out = jnp.concatenate(maps, axis=-1) if s > 1 else bev
        return out, aux
