#!/usr/bin/env python
"""Scatter microstructure: is the XLA BEV scatter row-bound or byte-bound?

Times `lift_splat_pool` at BSM scale (stride-8, HW=20736) and sweeps the
context width C — if time is ~constant in C the scatter serialises per ROW
(nothing to gain from narrower payloads); if it scales with C it is
byte-bound (bf16 payloads would halve it).

Run: python tools/profile_scatter.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def timeit(name, fn, *args):
    @jax.jit
    def reduced(*a):
        return jnp.sum(fn(*a).astype(jnp.float32))
    np.asarray(reduced(*args))
    np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(reduced(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool, topk_lift_inputs

    rng = np.random.default_rng(0)
    # BSM r50 128 grid: stride-8 -> fH, fW = 108, 192; D=90; cells 128^2
    N, D, HW, CELLS, K = 2, 90, 108 * 192, 128 * 128, 16
    height = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(N, D, HW)).astype(np.float32)) * 3, axis=1)
    cells = rng.integers(0, CELLS, size=(N, D, HW)).astype(np.int32)
    cells = np.where(rng.random((N, D, HW)) < 0.35, CELLS, cells)
    cell_index = jnp.asarray(cells)

    hk, ck = topk_lift_inputs(height, cell_index, K, method="exact")
    print(f"BSM-scale: N={N} HW={HW} D={D} (top-{K}: {N * K * HW} points)")

    for c in (8, 40, 80, 160):
        ctx = jnp.asarray(rng.normal(size=(N, HW, c)).astype(np.float32))
        timeit(f"scatter top-{K} C={c}",
               jax.jit(functools.partial(lift_splat_pool, batch=N,
                                         num_cells=CELLS)), hk, ctx, ck)

    ctx80 = jnp.asarray(rng.normal(size=(N, HW, 80)).astype(np.float32))
    timeit("scatter exact 90-bin C=80",
           jax.jit(functools.partial(lift_splat_pool, batch=N,
                                     num_cells=CELLS)),
           height, ctx80, cell_index)




def dcn_gather_width_sweep():
    """Is the DCN windowed (2,2,C) gather row- or byte-bound? Run with
    `python tools/profile_scatter.py dcn`."""
    from sgv3d_tpu.ops.dcn import bilinear_sample_window_nhwc
    rng = np.random.default_rng(0)
    B, H, W = 8, 54, 96
    M = H * W * 9
    py = jnp.asarray(rng.uniform(-1, H, (B, M)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-1, W, (B, M)).astype(np.float32))
    for c in (64, 128, 256, 512):
        x = jnp.asarray(rng.normal(size=(B, H, W, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        timeit(f"dcn window gather C={c} ({B}x{M} slices)",
               jax.jit(bilinear_sample_window_nhwc), x, py, px)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "dcn":
        dcn_gather_width_sweep()
    else:
        main()
