#!/usr/bin/env python
"""Profile the jitted training step on the real TPU chip (SGV3D-r50 bs2).

Splits the per-step wall time into: device-resident jitted step / fwd-only /
fwd+bwd / host->device batch transfer — so training-perf work targets the
right part (the axon relay makes host transfers far more expensive than they
would be on directly-attached HBM).

Run: python tools/profile_train.py [--exp sgv3d_r50_128] [--batch 2]
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


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="sgv3d_r50_128")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight, train_loss
    from sgv3d_tpu.train.loop import create_train_state, make_train_step
    from sgv3d_tpu.train.optim import make_optimizer

    cfg = get_exp(args.exp)
    on_tpu = jax.devices()[0].platform != "cpu"
    model = BEVHeight(cfg, dtype=jnp.bfloat16 if on_tpu else None)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=args.batch, num_objs=8)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=100)
    state = create_train_state(
        model, cfg, tx, (imgs[:1], {k: v[:1] for k, v in mats.items()}))
    step = make_train_step(model, cfg, tx, mesh=None, donate=False)

    jb = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
          jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
          jnp.asarray(gt_semantic))
    fence(jb)  # materialise on device

    it = args.iters

    # (1) full jitted step, device-resident batch
    st, metrics = step(state, *jb)
    fence(metrics["total_loss"])
    st, metrics = step(state, *jb)
    fence(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(it):
        st, metrics = step(state, *jb)
        fence(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / it * 1e3
    print(f"{'train_step (device-resident batch)':44s} {dt:8.1f} ms",
          flush=True)

    # (2) fwd-only (loss value)
    @jax.jit
    def fwd(params, batch_stats, imgs, mats, gb, gl, gs):
        (preds, aux), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, mats, True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"])
        loss, _ = train_loss(cfg, preds, aux, gb, gl, gs, None)
        return loss

    fence(fwd(state.params, state.batch_stats, *jb))
    fence(fwd(state.params, state.batch_stats, *jb))
    t0 = time.perf_counter()
    for _ in range(it):
        fence(fwd(state.params, state.batch_stats, *jb))
    print(f"{'fwd + loss only':44s} "
          f"{(time.perf_counter() - t0) / it * 1e3:8.1f} ms", flush=True)

    # (3) fwd+bwd (no optimizer)
    @jax.jit
    def fwdbwd(params, batch_stats, imgs, mats, gb, gl, gs):
        def loss_fn(p):
            (preds, aux), _ = model.apply(
                {"params": p, "batch_stats": batch_stats}, imgs, mats, True,
                rngs={"dropout": jax.random.PRNGKey(0)},
                mutable=["batch_stats"])
            loss, _ = train_loss(cfg, preds, aux, gb, gl, gs, None)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        # consume grads so XLA cannot dead-code-eliminate the backward
        return loss + 0.0 * sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                                for g in jax.tree_util.tree_leaves(grads))

    fence(fwdbwd(state.params, state.batch_stats, *jb))
    fence(fwdbwd(state.params, state.batch_stats, *jb))
    t0 = time.perf_counter()
    for _ in range(it):
        fence(fwdbwd(state.params, state.batch_stats, *jb))
    print(f"{'fwd + bwd (no optimizer)':44s} "
          f"{(time.perf_counter() - t0) / it * 1e3:8.1f} ms", flush=True)

    # (4) host->device transfer of one batch
    t0 = time.perf_counter()
    for _ in range(it):
        jb2 = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
               jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
               jnp.asarray(gt_semantic))
        fence(jb2)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(jb))
    dt = (time.perf_counter() - t0) / it * 1e3
    print(f"{'host->device batch transfer (fp32 imgs)':44s} {dt:8.1f} ms "
          f"({nbytes / 1e6:.0f} MB)", flush=True)

    # (5) uint8-image batch transfer (the runner's device_normalize path)
    imgs_u8 = np.clip(imgs * 58 + 115, 0, 255).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(it):
        jb3 = (jnp.asarray(imgs_u8),
               {k: jnp.asarray(v) for k, v in mats.items()},
               jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
               jnp.asarray(gt_semantic))
        fence(jb3)
    nbytes = (imgs_u8.nbytes
              + sum(x.nbytes for x in jax.tree_util.tree_leaves(jb[1:])))
    dt = (time.perf_counter() - t0) / it * 1e3
    print(f"{'host->device batch transfer (uint8 imgs)':44s} {dt:8.1f} ms "
          f"({nbytes / 1e6:.0f} MB)", flush=True)


if __name__ == "__main__":
    main()
