#!/usr/bin/env python
"""Smoke-run the extreme experiment configs on the real TPU chip.

Proves the heavy variants compile and execute end-to-end (forward + decode)
within HBM on one chip, and reports their per-batch latency:
  * bevheight_rope3d_r101_140m — 140.8 m range, BEV grid 1408x1408
    (1.98M cells; head grid 1408 -> feature map 352x352)
  * sgv3d_r101_256 — BSM backbone (stride-8 lift: 108x192 pixels), 180
    height bins, BEV grid 1024x1024

Run: python tools/smoke_big_configs.py [--batch 2]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--exps", default="bevheight_rope3d_r101_140m,sgv3d_r101_256")
    args = ap.parse_args()

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.decode import decode
    from sgv3d_tpu.models.bev_height import BEVHeight

    on_tpu = jax.devices()[0].platform != "cpu"
    for name in args.exps.split(","):
        cfg = get_exp(name)
        grid = cfg.backbone.voxel_grid
        print(f"--- {name}: grid {int(grid.voxel_num[0])}^2, "
              f"D={cfg.backbone.num_height_bins}, "
              f"bsm={cfg.backbone.is_bsm}, batch={args.batch}", flush=True)
        imgs, mats, *_ = make_batch(cfg, batch=args.batch, num_objs=8)
        model = BEVHeight(cfg, dtype=jnp.bfloat16 if on_tpu else None)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(imgs[:1]),
            {k: jnp.asarray(v[:1]) for k, v in mats.items()}, False)

        @jax.jit
        def infer(variables, imgs, mats):
            preds, _ = model.apply(variables, imgs, mats, False)
            return decode(cfg.head, preds)

        jimgs = jnp.asarray(imgs)
        jmats = {k: jnp.asarray(v) for k, v in mats.items()}
        t0 = time.perf_counter()
        out = infer(variables, jimgs, jmats)
        np.asarray(out.scores)
        print(f"  compile+first run: {time.perf_counter() - t0:.1f} s",
              flush=True)
        np.asarray(infer(variables, jimgs, jmats).scores)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            np.asarray(infer(variables, jimgs, jmats).scores)
        dt = (time.perf_counter() - t0) / iters
        print(f"  steady: {dt * 1e3:.1f} ms/batch "
              f"({args.batch / dt:.2f} img/s)", flush=True)


if __name__ == "__main__":
    main()
