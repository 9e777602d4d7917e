#!/usr/bin/env python
"""Measure top-k selection variants + fused top-k lift paths on TPU."""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, FH, FW, C = 8, 90, 54, 96, 80
HW = FH * FW
P = D * HW
CELLS = 128 * 128
ITERS = 10
K = 16


def timeit(name, fn, *args):
    @jax.jit
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))
    np.asarray(reduced(*args))
    np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(reduced(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool, topk_lift_inputs

    rng = np.random.default_rng(0)
    height = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(N, D, HW)).astype(np.float32)), axis=1)
    context = jnp.asarray(rng.normal(size=(N, HW, C)).astype(np.float32))
    cells = rng.integers(0, CELLS, size=(N, D, HW)).astype(np.int32)
    trash = rng.random((N, D, HW)) < 0.35
    cell_index = jnp.asarray(np.where(trash, CELLS, cells))

    # fence baseline: how much is fixed fetch overhead
    timeit("noop (fetch overhead baseline)", lambda h: h[0, 0, 0], height)

    # exact top_k as currently implemented (transpose + lax.top_k)
    timeit("top_k exact (lax.top_k over D)",
           jax.jit(functools.partial(topk_lift_inputs, k=K)),
           height, cell_index)

    # approx_max_k over the last axis after transpose
    @jax.jit
    def approx_topk(height, cell_index):
        h_t = height.transpose(0, 2, 1)              # (N, HW, D)
        vals, idx = jax.lax.approx_max_k(h_t, K)
        cells_t = jnp.take_along_axis(
            cell_index.transpose(0, 2, 1), idx, axis=-1)
        return vals.transpose(0, 2, 1), cells_t.transpose(0, 2, 1)
    timeit("top_k approx (lax.approx_max_k)", approx_topk, height, cell_index)

    # sort-based exact top-k: sort D (tiny axis) descending, slice K
    @jax.jit
    def sort_topk(height, cell_index):
        h_t = height.transpose(0, 2, 1)
        order = jnp.argsort(-h_t, axis=-1)[..., :K]
        vals = jnp.take_along_axis(h_t, order, axis=-1)
        cells_t = jnp.take_along_axis(
            cell_index.transpose(0, 2, 1), order, axis=-1)
        return vals.transpose(0, 2, 1), cells_t.transpose(0, 2, 1)
    timeit("top_k via argsort(D)", sort_topk, height, cell_index)

    # fused model-style paths (selection + pooling in one jit)
    def fused_xla(height, context, cell_index):
        h, c = topk_lift_inputs(height, cell_index, K)
        return lift_splat_pool(h, context, c, N, CELLS)
    timeit("fused top_k exact + xla scatter", jax.jit(fused_xla),
           height, context, cell_index)

    def fused_approx(height, context, cell_index):
        h, c = approx_topk(height, cell_index)
        return lift_splat_pool(h, context, c, N, CELLS)
    timeit("fused top_k approx + xla scatter", jax.jit(fused_approx),
           height, context, cell_index)

    os.environ["SGV3D_TPU_PALLAS"] = "1"
    timeit("fused top_k exact + pallas", jax.jit(fused_xla),
           height, context, cell_index)
    timeit("fused top_k approx + pallas", jax.jit(fused_approx),
           height, context, cell_index)
    os.environ.pop("SGV3D_TPU_PALLAS")

    # exact baseline for reference
    timeit("exact (all 90 bins) xla scatter",
           jax.jit(functools.partial(lift_splat_pool, batch=N,
                                     num_cells=CELLS)),
           height, context, cell_index)


if __name__ == "__main__":
    main()
