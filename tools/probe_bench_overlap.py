"""Probe: can overlapping the host fetch with the next batch's compute
raise e2e inference throughput? Compares, on the real TPU chip:

  A. serial loop (bench.py today): infer -> fetch scores -> infer -> ...
  B. pipelined loop: dispatch infer(i), fetch scores(i-1) while i computes
  C. pipelined at batch 16

The fetch is the only reliable fence on the axon relay (block_until_ready
is a no-op there), so A pays the full relay round-trip latency per batch;
B hides it behind compute, which is how a real serving host overlaps
readback with the next request.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch):
    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.decode import decode
    from sgv3d_tpu.models.bev_height import BEVHeight

    cfg = get_exp("bevheight_dair_r101_128")
    imgs, mats, *_ = make_batch(cfg, batch=batch, num_objs=8)
    model = BEVHeight(cfg, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs[:1]), {k: jnp.asarray(v[:1]) for k, v in mats.items()},
        False)

    @jax.jit
    def infer(variables, imgs, mats):
        preds, _ = model.apply(variables, imgs, mats, False)
        return decode(cfg.head, preds)

    jimgs = jnp.asarray(imgs)
    jmats = {k: jnp.asarray(v) for k, v in mats.items()}
    return infer, variables, jimgs, jmats


def run(batch, iters=10):
    infer, variables, jimgs, jmats = build(batch)
    # warmup: compile + open the fetch path (first fetch can take minutes)
    for _ in range(2):
        out = infer(variables, jimgs, jmats)
        np.asarray(out.scores)

    # A: serial
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, jimgs, jmats)
        np.asarray(out.scores)
    dt_a = time.perf_counter() - t0

    # B: pipelined (fetch i-1 while i computes)
    prev = infer(variables, jimgs, jmats)
    t0 = time.perf_counter()
    for _ in range(iters):
        cur = infer(variables, jimgs, jmats)
        np.asarray(prev.scores)
        prev = cur
    dt_b = time.perf_counter() - t0
    np.asarray(prev.scores)

    print(f"bs{batch}: serial    {dt_a/iters*1000:7.1f} ms/batch "
          f"{batch*iters/dt_a:6.2f} img/s")
    print(f"bs{batch}: pipelined {dt_b/iters*1000:7.1f} ms/batch "
          f"{batch*iters/dt_b:6.2f} img/s")


def main():
    import sys as _sys
    print("devices:", jax.devices())
    batches = [int(b) for b in _sys.argv[1:]] or [8, 16]
    for b in batches:
        run(b)


if __name__ == "__main__":
    main()
