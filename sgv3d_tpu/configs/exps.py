"""The nine experiment configs mirroring the reference's exp files.

Variant axes (reference: /root/reference/exps/**): dataset root, ResNet depth
50/101, BEV voxel 0.8 <-> 0.4 m (head grid 512 <-> 1024, head voxel 0.2 <->
0.1), d_bound, x/y range 102.4 <-> 140.8, is_bsm, max_epochs.
"""
from __future__ import annotations

from sgv3d_tpu.config import BackboneConfig, ExpConfig, HeadConfig


def _backbone(depth, voxel, d_bound, xmax=102.4, ymax=51.2, is_bsm=False):
    return BackboneConfig(
        x_bound=(0.0, xmax, voxel),
        y_bound=(-ymax, ymax, voxel),
        z_bound=(-5.0, 3.0, 8.0),
        d_bound=d_bound,
        final_dim=(864, 1536),
        output_channels=80,
        downsample_factor=16,
        resnet_depth=depth,
        is_bsm=is_bsm,
        # Deploy default: pool only the top-16 height bins per pixel at
        # inference (training always pools all bins). The trained DID softmax
        # concentrates its mass in a few bins, so this is near-exact
        # (tests/test_model.py::test_topk_lift_near_exact_after_training)
        # and cuts the BEV scatter ~3x (tools/profile_topk.py).
        lift_top_k=16,
        # Heavy variants (r101 backbone or 180 height bins) need backbone
        # remat to fit a training step in one chip's HBM.
        remat_backbone=(depth >= 101 or int(d_bound[2]) >= 180),
    )


def _head(head_voxel, grid, is_bsm=False, xmax=102.4, ymax=51.2):
    return HeadConfig(
        bev_backbone_in_channels=87 if is_bsm else 80,
        bev_backbone_base_channels=174 if is_bsm else 160,
        point_cloud_range=(0, -ymax, -5, xmax, ymax, 3),
        grid_size=(grid, grid, 1),
        voxel_size=(head_voxel, head_voxel, 8),
        post_center_range=(0.0, -(ymax + 10), -10.0, xmax + 20, ymax + 10, 10.0),
    )


def _exp(name, depth, voxel, d_bound, is_bsm, data_root, max_epochs,
         xmax=102.4, ymax=51.2, batch=2):
    head_voxel = voxel / 4.0
    grid = int(xmax / head_voxel)
    return ExpConfig(
        name=name,
        backbone=_backbone(depth, voxel, d_bound, xmax, ymax, is_bsm),
        head=_head(head_voxel, grid, is_bsm, xmax, ymax),
        is_train_height=True,
        max_epochs=max_epochs,
        data_root=data_root,
        batch_size_per_device=batch,
    )


EXPS = {
    # BASELINE.json configs[0]: r18 single-frame CPU-inference sanity config
    # (no reference exp file uses r18 for the image backbone; this exists for
    # the driver's smallest benchmark config and quick local runs).
    "bevheight_dair_r18_128": _exp(
        "bevheight_dair_r18_128", 18, 0.8, (-2.0, 0.0, 90), False,
        "data/dair-v2x-i", 85, batch=1),
    # BEVHeight on DAIR-V2X-I (d_bound [-2, 0], embed-MSE aux in reference)
    "bevheight_dair_r50_128": _exp(
        "bevheight_dair_r50_128", 50, 0.8, (-2.0, 0.0, 90), False,
        "data/dair-v2x-i", 85, batch=8),
    "bevheight_dair_r50_256": _exp(
        "bevheight_dair_r50_256", 50, 0.4, (-2.0, 0.0, 90), False,
        "data/dair-v2x-i", 100, batch=8),
    "bevheight_dair_r101_128": _exp(
        "bevheight_dair_r101_128", 101, 0.8, (-2.0, 0.0, 90), False,
        "data/dair-v2x-i", 100, batch=8),
    "bevheight_dair_r101_256": _exp(
        "bevheight_dair_r101_256", 101, 0.4, (-2.0, 0.0, 90), False,
        "data/dair-v2x-i", 100, batch=8),
    # BEVHeight on Rope3D (taller d_bound)
    "bevheight_rope3d_r50_128": _exp(
        "bevheight_rope3d_r50_128", 50, 0.8, (-2.0, 3.5, 90), False,
        "data/rope3d", 20, batch=8),
    "bevheight_rope3d_r101_256": _exp(
        "bevheight_rope3d_r101_256", 101, 0.4, (-2.0, 3.5, 180), False,
        "data/rope3d", 30, batch=8),
    "bevheight_rope3d_r101_140m": _exp(
        "bevheight_rope3d_r101_140m", 101, 0.4, (-0.5, 2.5, 90), False,
        "data/rope3d", 30, xmax=140.8, ymax=70.4, batch=8),
    # SGV3D (BSM backbone + semantic suppression + SSDG training data)
    "sgv3d_r50_128": _exp(
        "sgv3d_r50_128", 50, 0.8, (-2.0, 3.5, 90), True,
        "data/rope3d-kitti", 20, batch=2),
    "sgv3d_r101_256": _exp(
        "sgv3d_r101_256", 101, 0.4, (-2.0, 3.5, 180), True,
        "data/rope3d-kitti", 30, batch=2),
}


def get_exp(name: str) -> ExpConfig:
    if name not in EXPS:
        raise KeyError(f"unknown exp '{name}'; available: {sorted(EXPS)}")
    return EXPS[name]
