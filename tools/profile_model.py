#!/usr/bin/env python
"""Per-stage inference profile of BEVHeight-r101 864x1536 batch 8 on TPU.

Times each pipeline stage (backbone / neck / heightnet / dcn / geometry /
top-k / lift scatter / bev head / decode) in isolation with realistic shapes
so perf work targets the real bottleneck. Numbers land in the CLAUDE.md perf
ledger. Relay-safe timing: on-device scalar reduce + host fetch as the fence.

Run: python tools/profile_model.py [--batch 8] [--iters 10]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=10):
    @jax.jit
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))
    np.asarray(reduced(*args))
    np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(reduced(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--exp", default="bevheight_dair_r101_128")
    args = ap.parse_args()

    from sgv3d_tpu import geom
    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.decode import decode
    from sgv3d_tpu.heads.bev_head import BEVHeightHead
    from sgv3d_tpu.nn.height_net import HeightNet
    from sgv3d_tpu.nn.resnet import ResNet
    from sgv3d_tpu.nn.second_fpn import SECONDFPN
    from sgv3d_tpu.ops.dcn import DeformConv
    from sgv3d_tpu.ops.voxel_pooling import (
        flatten_voxel_index, lift_splat_pool, topk_lift_inputs)

    cfg = get_exp(args.exp)
    B = args.batch
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else None
    fH, fW = cfg.backbone.feat_hw
    D = cfg.backbone.num_height_bins
    C = cfg.backbone.output_channels
    grid = cfg.backbone.voxel_grid
    nx, ny = int(grid.voxel_num[0]), int(grid.voxel_num[1])
    H, W = cfg.backbone.final_dim
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    imgs, mats, *_ = make_batch(cfg, batch=B, num_objs=8)
    imgs = jnp.asarray(imgs[:, 0, 0]).astype(dtype or jnp.float32)  # (B,H,W,3)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}

    it = args.iters
    total = 0.0

    # --- backbone ---
    backbone = ResNet(cfg.backbone.resnet_depth, out_indices=(0, 1, 2, 3),
                      dtype=dtype)
    bvars = backbone.init(k1, imgs[:1], False)
    feats = jax.jit(lambda v, x: backbone.apply(v, x, False))(bvars, imgs)
    total += timeit(f"resnet{cfg.backbone.resnet_depth}",
                    lambda v, x: backbone.apply(v, x, False), bvars, imgs,
                    iters=it)

    # --- neck ---
    neck = SECONDFPN(cfg.backbone.img_neck_out_channels, (0.25, 0.5, 1, 2),
                     dtype=dtype)
    nvars = neck.init(k1, [f[:1] for f in feats], False)
    feat = jax.jit(lambda v, f: neck.apply(v, f, False))(nvars, feats)
    total += timeit("secondfpn", lambda v, f: neck.apply(v, f, False),
                    nvars, feats, iters=it)

    # --- heightnet (includes DCN) ---
    hnet = HeightNet(mid_channels=cfg.backbone.height_net_mid_channels[0],
                     context_channels=C, height_channels=D, dtype=dtype)
    mlp_input = geom.camera_mlp_input(
        jmats["intrin_mats"][:, 0], jmats["ida_mats"][:, 0],
        jmats["sensor2ego_mats"][:, 0], jmats["bda_mat"])
    hvars = hnet.init(k1, feat[:1], mlp_input[:, 0][:1], False)
    mlp_in = mlp_input[:, 0]
    total += timeit("heightnet(total)",
                    lambda v, f, m: hnet.apply(v, f, m, False),
                    hvars, feat, mlp_in, iters=it)

    # --- DCN alone (512ch, groups=4) ---
    mid = cfg.backbone.height_net_mid_channels[0]
    x512 = jax.random.normal(k2, (B, fH, fW, mid),
                             dtype or jnp.float32)
    dcn = DeformConv(mid, kernel=3, groups=4)
    dvars = dcn.init(k1, x512[:1])
    timeit("  dcn alone (window gather)", lambda v, x: dcn.apply(v, x),
           dvars, x512, iters=it)
    from sgv3d_tpu.ops import dcn as dcn_mod
    off = jax.random.normal(k2, (B, fH, fW, 18), dtype or jnp.float32)
    wgt = jax.random.normal(k1, (3, 3, mid // 4, mid), jnp.float32)
    timeit("  dcn alone (4-corner gather)",
           lambda x, o, w: dcn_mod.deform_conv2d(
               x, o, w, kernel=3, groups=4, sampler="corner"),
           x512, off, wgt, iters=it)

    # --- geometry ---
    frustum = jnp.asarray(geom.make_frustum(
        cfg.backbone.final_dim, cfg.backbone.effective_downsample,
        cfg.backbone.d_bound))

    def geo(m):
        pts = geom.get_geometry(
            frustum, m["sensor2ego_mats"][:, 0], m["sensor2virtual_mats"][:, 0],
            m["intrin_mats"][:, 0], m["ida_mats"][:, 0],
            m["reference_heights"][:, 0], m.get("bda_mat"))
        vox = geom.geometry_to_voxel(pts, grid)
        return flatten_voxel_index(vox, tuple(grid.voxel_num))

    total += timeit("geometry+voxelize", geo, jmats, iters=it)

    # --- lift: top-k select + scatter ---
    cell = geo(jmats).reshape(B, D, fH * fW)
    hp = jax.nn.softmax(
        jax.random.normal(k2, (B, D, fH * fW)) * 3.0, axis=1)
    ctx = jax.random.normal(k2, (B, fH * fW, C), jnp.float32)
    k = cfg.backbone.lift_top_k
    if k:
        total += timeit(f"topk select (k={k})",
                        lambda h, c: topk_lift_inputs(h, c, k),
                        hp, cell, iters=it)
        hp_k, cell_k = topk_lift_inputs(hp, cell, k)
    else:
        hp_k, cell_k = hp, cell
    total += timeit("lift_splat_pool (scatter)",
                    lambda h, c, i: lift_splat_pool(h, c, i, B, ny * nx),
                    hp_k, ctx, cell_k, iters=it)
    timeit("  lift_splat_pool exact (all bins)",
           lambda h, c, i: lift_splat_pool(h, c, i, B, ny * nx),
           hp, ctx, cell, iters=it)

    # --- bev head ---
    bev = jax.random.normal(k2, (B, ny, nx, cfg.head.bev_backbone_in_channels),
                            jnp.float32)
    head = BEVHeightHead(cfg.head, dtype=dtype)
    hdvars = head.init(k1, bev[:1], False)
    preds = jax.jit(lambda v, x: head.apply(v, x, False))(hdvars, bev)
    total += timeit("bev head", lambda v, x: head.apply(v, x, False),
                    hdvars, bev, iters=it)

    # --- decode + NMS ---
    total += timeit("decode+nms", lambda p: decode(cfg.head, p), preds,
                    iters=it)

    print(f"{'SUM of stages':44s} {total:8.2f} ms "
          f"({B / total * 1e3:.1f} img/s equiv, fetch overhead included "
          f"per stage)")


if __name__ == "__main__":
    main()
