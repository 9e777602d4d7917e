#!/usr/bin/env python
"""Per-stage inference profile of BEVHeight-r101 864x1536 batch 8 on TPU.

Times each pipeline stage (backbone / neck / heightnet / dcn / geometry /
top-k / lift scatter / bev head / decode) in isolation with realistic shapes
so perf work targets the real bottleneck. Numbers land in the CLAUDE.md perf
ledger. Relay-safe timing: on-device scalar reduce + host fetch as the fence
(each figure therefore carries the ~20 ms fixed fetch overhead).

Run: python tools/profile_model.py [--batch 8] [--iters 10]
     [--stages resnet,topk,...]   (substring filter)
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
    ap.add_argument("--stages", default=None,
                    help="comma list; run stages whose name contains any")
    args = ap.parse_args()
    stages = args.stages.split(",") if args.stages else None

    def want(name):
        return stages is None or any(s in name for s in stages)

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
    k1, k2 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    imgs, mats, *_ = make_batch(cfg, batch=B, num_objs=8)
    imgs = jnp.asarray(imgs[:, 0, 0]).astype(dtype or jnp.float32)  # (B,H,W,3)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}

    it = args.iters
    mid = cfg.backbone.height_net_mid_channels[0]

    backbone = ResNet(cfg.backbone.resnet_depth, out_indices=(0, 1, 2, 3),
                      dtype=dtype)
    neck = SECONDFPN(cfg.backbone.img_neck_out_channels, (0.25, 0.5, 1, 2),
                     dtype=dtype)
    _cache = {}

    def feats():
        if "feats" not in _cache:
            bvars = backbone.init(k1, imgs[:1], False)
            _cache["bvars"] = bvars
            _cache["feats"] = jax.jit(
                lambda v, x: backbone.apply(v, x, False))(bvars, imgs)
        return _cache["feats"]

    def feat():
        if "feat" not in _cache:
            nvars = neck.init(k1, [f[:1] for f in feats()], False)
            _cache["nvars"] = nvars
            _cache["feat"] = jax.jit(
                lambda v, f: neck.apply(v, f, False))(nvars, feats())
        return _cache["feat"]

    if want("resnet"):
        f = feats()
        timeit(f"resnet{cfg.backbone.resnet_depth}",
               lambda v, x: backbone.apply(v, x, False),
               _cache["bvars"], imgs, iters=it)

    if want("secondfpn"):
        feat()
        timeit("secondfpn", lambda v, f: neck.apply(v, f, False),
               _cache["nvars"], feats(), iters=it)

    mlp_in = geom.camera_mlp_input(
        jmats["intrin_mats"][:, 0], jmats["ida_mats"][:, 0],
        jmats["sensor2ego_mats"][:, 0], jmats["bda_mat"])  # (BN, 27)

    if want("heightnet"):
        hnet = HeightNet(mid_channels=mid, context_channels=C,
                         height_channels=D, dtype=dtype)
        hvars = hnet.init(k1, feat()[:1], mlp_in[:1], False)
        timeit("heightnet(total)",
               lambda v, f, m: hnet.apply(v, f, m, False),
               hvars, feat(), mlp_in, iters=it)

    if want("dcn"):
        x512 = jax.random.normal(k2, (B, fH, fW, mid), dtype or jnp.float32)
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

    if want("geometry"):
        timeit("geometry+voxelize", geo, jmats, iters=it)

    if want("topk") or want("lift"):
        cell = geo(jmats).reshape(B, D, fH * fW)
        hp = jax.nn.softmax(
            jax.random.normal(k2, (B, D, fH * fW)) * 3.0, axis=1)
        ctx = jax.random.normal(k2, (B, fH * fW, C), jnp.float32)
        k = cfg.backbone.lift_top_k
        if k and want("topk"):
            from sgv3d_tpu.ops.voxel_pooling import topk_lift_inputs_hwd
            hp_hwd = jnp.asarray(np.ascontiguousarray(
                np.asarray(hp).transpose(0, 2, 1)))
            cell_hwd = jnp.asarray(np.ascontiguousarray(
                np.asarray(cell).transpose(0, 2, 1)))
            timeit(f"topk select (k={k}, dhw in)",
                   lambda h, c: topk_lift_inputs(h, c, k),
                   hp, cell, iters=it)
            timeit(f"topk select (k={k}, hwd approx)",
                   lambda h, c: topk_lift_inputs_hwd(h, c, k),
                   hp_hwd, cell_hwd, iters=it)
            timeit(f"topk select (k={k}, hwd exact)",
                   lambda h, c: topk_lift_inputs_hwd(h, c, k, "exact"),
                   hp_hwd, cell_hwd, iters=it)
            timeit(f"topk select (k={k}, hwd pallas)",
                   lambda h, c: topk_lift_inputs_hwd(h, c, k, "pallas"),
                   hp_hwd, cell_hwd, iters=it)
        if want("lift"):
            hp_k, cell_k = (topk_lift_inputs(hp, cell, k) if k
                            else (hp, cell))
            timeit("lift_splat_pool (scatter)",
                   lambda h, c, i: lift_splat_pool(h, c, i, B, ny * nx),
                   hp_k, ctx, cell_k, iters=it)
            timeit("  lift_splat_pool exact (all bins)",
                   lambda h, c, i: lift_splat_pool(h, c, i, B, ny * nx),
                   hp, ctx, cell, iters=it)

    if want("head") or want("decode"):
        bev = jax.random.normal(
            k2, (B, ny, nx, cfg.head.bev_backbone_in_channels), jnp.float32)
        head = BEVHeightHead(cfg.head)
        hdvars = head.init(k1, bev[:1], False)
        preds = jax.jit(lambda v, x: head.apply(v, x, False))(hdvars, bev)
        if want("head"):
            timeit("bev head", lambda v, x: head.apply(v, x, False),
                   hdvars, bev, iters=it)
        if want("decode"):
            timeit("decode+nms", lambda p: decode(cfg.head, p), preds,
                   iters=it)


if __name__ == "__main__":
    main()
