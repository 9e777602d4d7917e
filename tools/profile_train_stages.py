#!/usr/bin/env python
"""Per-stage fwd and fwd+bwd profile of the SGV3D-r50 TRAIN step (bs2).

The train step is ~300 ms of which the exact lift fwd+bwd is ~104 ms
(tools/profile_lift_bwd.py); this splits the remainder: image backbone +
necks, MSCThead, full BSM backbone (adds lift), BEV head, and
targets+losses, each timed in isolation fwd-only and fwd+grad. Relay-safe
fencing: every timed function returns an on-device scalar which is fetched
to host (block_until_ready does not fence on the axon relay; whole-array
fetches pay a per-shape path-setup cost).

Run: python tools/profile_train_stages.py [--batch 2] [--iters 5]
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


def ssum(x):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(x))


def timeit(name, fn, *args, iters=5):
    jfn = jax.jit(fn)
    float(np.asarray(jax.device_get(jfn(*args))))
    float(np.asarray(jax.device_get(jfn(*args))))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(jax.device_get(jfn(*args))))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--exp", default="sgv3d_r50_128")
    args = ap.parse_args()

    import flax.linen as nn

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.heads.bev_head import BEVHeightHead
    from sgv3d_tpu.models.bev_height import BEVHeight, train_loss
    from sgv3d_tpu.nn.lss_fpn import BSMLSSFPN
    from sgv3d_tpu.nn.msct_head import MSCThead
    from sgv3d_tpu.nn.resnet import ResNet
    from sgv3d_tpu.nn.second_fpn import SECONDFPN
    from sgv3d_tpu import geom

    cfg = get_exp(args.exp)
    bcfg = cfg.backbone
    B = args.batch
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else None
    it = args.iters

    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=B, num_objs=8)
    jb_imgs = jnp.asarray(imgs)          # (B, S, N, H, W, 3)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}
    flat_imgs = jb_imgs[:, 0, 0].astype(dtype or jnp.float32)  # (B, H, W, 3)

    class BackNecks(nn.Module):
        """backbone + the two SECONDFPN necks (stride 16 and 8)."""
        @nn.compact
        def __call__(self, x, train):
            feats = ResNet(bcfg.resnet_depth, out_indices=(0, 1, 2, 3),
                           dtype=dtype, name="img_backbone")(x, train)
            f16 = SECONDFPN(bcfg.img_neck_out_channels, (0.25, 0.5, 1, 2),
                            dtype=dtype, name="img_neck_16")(feats, train)
            f8 = SECONDFPN(bcfg.img_neck_out_channels, (0.5, 1, 2, 4),
                           dtype=dtype, name="img_neck_8")(feats, train)
            return f16, f8

    rng = {"params": jax.random.PRNGKey(0)}

    def grad_fn(apply_with_loss, params):
        loss, grads = jax.value_and_grad(apply_with_loss)(params)
        return loss + 0.0 * ssum(grads)

    # -- stage 1: backbone + necks ----------------------------------------
    bn = BackNecks()
    v_bn = bn.init(rng, flat_imgs, False)
    mutable = [k for k in v_bn if k != "params"]

    def bn_fwd(params, x):
        out, _ = bn.apply({**v_bn, "params": params}, x, True,
                          mutable=mutable)
        return ssum(out)

    timeit("backbone+necks fwd", bn_fwd, v_bn["params"], flat_imgs, iters=it)
    timeit("backbone+necks fwd+bwd",
           lambda p, x: grad_fn(lambda pp: bn_fwd(pp, x), p),
           v_bn["params"], flat_imgs, iters=it)

    f16, f8 = bn.apply(v_bn, flat_imgs, False)
    f16 = jnp.asarray(jax.device_get(f16))
    f8 = jnp.asarray(jax.device_get(f8))
    print(f"  f16 {f16.shape} f8 {f8.shape}")

    # -- stage 2: MSCThead -------------------------------------------------
    msct = MSCThead(mid_channels=tuple(bcfg.height_net_mid_channels),
                    depth_channels=bcfg.num_height_bins,
                    semantic_channels=bcfg.semantic_channels,
                    context_channels=bcfg.output_channels, dtype=dtype)
    mlp_input = geom.camera_mlp_input(
        jmats["intrin_mats"][:, 0], jmats["ida_mats"][:, 0],
        jmats["sensor2ego_mats"][:, 0], jmats["bda_mat"])
    v_ms = msct.init(rng, [f16, f8], mlp_input, False)
    ms_mut = [k for k in v_ms if k != "params"]

    def ms_fwd(params, a, b, mi):
        out, _ = msct.apply({**v_ms, "params": params}, [a, b], mi, True,
                            mutable=ms_mut,
                            rngs={"dropout": jax.random.PRNGKey(0)})
        return ssum(out)

    timeit("msct head fwd", ms_fwd, v_ms["params"], f16, f8, mlp_input,
           iters=it)
    timeit("msct head fwd+bwd",
           lambda p, a, b, mi: grad_fn(lambda pp: ms_fwd(pp, a, b, mi), p),
           v_ms["params"], f16, f8, mlp_input, iters=it)

    # -- stage 3: full BSM backbone (adds softmax/suppression/lift) -------
    bsm = BSMLSSFPN(bcfg, dtype=dtype)
    v_bsm = bsm.init(rng, jb_imgs, jmats, False)
    bsm_mut = [k for k in v_bsm if k != "params"]

    def bsm_fwd(params, x, m):
        out, _ = bsm.apply({**v_bsm, "params": params}, x, m, True,
                           mutable=bsm_mut,
                           rngs={"dropout": jax.random.PRNGKey(0)})
        return ssum(out)

    timeit("full BSM backbone fwd (necks+msct+lift)", bsm_fwd,
           v_bsm["params"], jb_imgs, jmats, iters=it)
    timeit("full BSM backbone fwd+bwd",
           lambda p, x, m: grad_fn(lambda pp: bsm_fwd(pp, x, m), p),
           v_bsm["params"], jb_imgs, jmats, iters=it)

    # -- stage 4: BEV head -------------------------------------------------
    grid = bcfg.voxel_grid
    nx, ny = int(grid.voxel_num[0]), int(grid.voxel_num[1])
    c_bev = bcfg.output_channels + bcfg.semantic_channels
    bev = jax.random.normal(jax.random.PRNGKey(2), (B, ny, nx, c_bev),
                            jnp.float32)
    head = BEVHeightHead(cfg.head)
    v_h = head.init(rng, bev, False)
    h_mut = [k for k in v_h if k != "params"]

    def head_fwd(params, x):
        out, _ = head.apply({**v_h, "params": params}, x, True,
                            mutable=h_mut)
        return ssum(out)

    timeit("bev head fwd", head_fwd, v_h["params"], bev, iters=it)
    timeit("bev head fwd+bwd",
           lambda p, x: grad_fn(lambda pp: head_fwd(pp, x), p),
           v_h["params"], bev, iters=it)

    # -- stage 5: targets + losses (incl. semantic aux) -------------------
    preds = head.apply(v_h, bev, False)
    sem0 = jnp.zeros((B, f16.shape[1], f16.shape[2], bcfg.semantic_channels))
    sem1 = jnp.zeros((B, f8.shape[1], f8.shape[2], bcfg.semantic_channels))
    jgb, jgl = jnp.asarray(gt_boxes), jnp.asarray(gt_labels)
    jgs = jnp.asarray(gt_semantic)

    def loss_fwd(preds, s0, s1, gb, gl, gs):
        loss, _ = train_loss(cfg, preds, (s0, s1), gb, gl, gs, None)
        return loss

    timeit("targets + all losses fwd", loss_fwd, preds, sem0, sem1, jgb,
           jgl, jgs, iters=it)

    def loss_fwdbwd(preds, s0, s1, gb, gl, gs):
        def f(pr):
            loss, _ = train_loss(cfg, pr, (s0, s1), gb, gl, gs, None)
            return loss
        loss, grads = jax.value_and_grad(f)(preds)
        return loss + 0.0 * ssum(grads)

    timeit("targets + all losses fwd+bwd", loss_fwdbwd, preds, sem0, sem1,
           jgb, jgl, jgs, iters=it)

    # -- reference total ---------------------------------------------------
    model = BEVHeight(cfg, dtype=dtype)
    from sgv3d_tpu.train.loop import create_train_state, make_train_step
    from sgv3d_tpu.train.optim import make_optimizer
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=100)
    state = create_train_state(
        model, cfg, tx, (imgs[:1], {k: v[:1] for k, v in mats.items()}))
    step = make_train_step(model, cfg, tx, mesh=None, donate=False)
    jbatch = (jb_imgs, jmats, jgb, jgl, jgs)
    st, metrics = step(state, *jbatch)
    float(np.asarray(jax.device_get(metrics["total_loss"])))
    st, metrics = step(state, *jbatch)
    float(np.asarray(jax.device_get(metrics["total_loss"])))
    t0 = time.perf_counter()
    for _ in range(it):
        st, metrics = step(st, *jbatch)
    float(np.asarray(jax.device_get(metrics["total_loss"])))
    dt = (time.perf_counter() - t0) / it * 1e3
    print(f"{'FULL train step (chained dispatch)':46s} {dt:8.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
