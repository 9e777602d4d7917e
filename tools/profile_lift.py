#!/usr/bin/env python
"""Profile the lift-splat pooling components on the real TPU chip.

Breaks the Pallas-path cost into sort / gather+scale / kernel so the perf
work targets the real bottleneck (CLAUDE.md perf ledger). Shapes follow
BEVHeight-r101 864x1536 batch 8: N=8 cams, D=90, fHW=54*96, C=80, grid 128².

Run: python tools/profile_lift.py   (TPU; relay sync via host fetches)
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

N, D, FH, FW, C = 8, 90, 54, 96, 80
HW = FH * FW
P = D * HW
CELLS = 128 * 128
ITERS = 10


def timeit(name, fn, *args):
    # Reduce outputs to one scalar ON DEVICE so only 4 bytes cross the axon
    # relay per iteration (fetching a large array costs seconds).
    @jax.jit
    def reduced(*a):
        out = fn(*a)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))
    out = reduced(*args)
    np.asarray(out)
    out = reduced(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = reduced(*args)
        np.asarray(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    from sgv3d_tpu.ops.pallas_lift_splat import (
        CHUNK, SUB, pallas_lift_splat_forward, pallas_sorted_segment_pool)
    from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool, topk_lift_inputs

    rng = np.random.default_rng(0)
    height = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(N, D, HW)).astype(np.float32)), axis=1)
    context = jnp.asarray(rng.normal(size=(N, HW, C)).astype(np.float32))
    # ~35% trash cells (out of grid), rest uniform — roughly realistic.
    cells = rng.integers(0, CELLS, size=(N, D, HW)).astype(np.int32)
    trash = rng.random((N, D, HW)) < 0.35
    cells = np.where(trash, CELLS, cells)
    cell_index = jnp.asarray(cells)

    print(f"P={P} points/cam, {N} cams, C={C}, cells={CELLS}")

    # (a) default XLA scatter path
    xla_fwd = jax.jit(functools.partial(lift_splat_pool, batch=N,
                                        num_cells=CELLS))
    timeit("xla scatter fwd", xla_fwd, height, context, cell_index)

    # (b) pallas full path
    pallas_fwd = jax.jit(functools.partial(pallas_lift_splat_forward,
                                           batch=N, num_cells=CELLS))
    timeit("pallas full (sort+gather+kernel)", pallas_fwd,
           height, context, cell_index)

    # (c) sort alone
    @jax.jit
    def sort_only(cell_index):
        keys = cell_index.reshape(N, P)
        return jax.vmap(lambda k: jax.lax.sort_key_val(
            k, jnp.arange(P, dtype=jnp.int32)))(keys)
    timeit("sort_key_val alone", sort_only, cell_index)

    sk, order = sort_only(cell_index)

    # (d) gather+scale+pad alone (sorted order given)
    num_chunks = -(-P // CHUNK)
    p_pad = num_chunks * CHUNK
    c_pad = -(-C // 128) * 128

    @jax.jit
    def gather_scale(order, height, context):
        def one(order, h, ctx):
            h_sorted = jnp.take(h.reshape(P), order)
            pix = order % HW
            vals = (h_sorted[:, None] * jnp.take(ctx, pix, axis=0)
                    ).astype(jnp.bfloat16)
            vals_p = jnp.zeros((p_pad, c_pad), jnp.bfloat16)
            return jax.lax.dynamic_update_slice(vals_p, vals, (0, 0))
        return jax.vmap(one)(order, height, context)
    timeit("gather+scale+pad alone", gather_scale, order, height, context)

    vals = gather_scale(order, height, context)

    # (e) kernel alone
    @jax.jit
    def kernel_only(sk, vals):
        skp = jnp.concatenate(
            [sk, jnp.broadcast_to(sk[:, -1:], (N, p_pad - P))], axis=1)
        return pallas_sorted_segment_pool(
            skp.reshape(N, num_chunks, 8, SUB),
            vals.reshape(N, num_chunks, CHUNK, c_pad), CELLS)
    timeit("pallas kernel alone (+key pad)", kernel_only, sk, vals)

    # (f) top-k prep alone and (g/h) reduced-P paths
    for k in (16,):
        topk = jax.jit(functools.partial(topk_lift_inputs, k=k))
        timeit(f"top_k={k} prep alone", topk, height, cell_index)
        hk, ck = topk(height, cell_index)
        xla_k = jax.jit(functools.partial(lift_splat_pool, batch=N,
                                          num_cells=CELLS))
        timeit(f"xla scatter fwd top_k={k}", xla_k, hk, context, ck)
        pal_k = jax.jit(functools.partial(pallas_lift_splat_forward,
                                          batch=N, num_cells=CELLS))
        timeit(f"pallas full top_k={k}", pal_k, hk, context, ck)

    # (i) static-rig split: per-frame work when sort is precomputed
    @jax.jit
    def static_rig_frame(order, sk, height, context):
        v = gather_scale(order, height, context)
        return kernel_only(sk, v)
    timeit("static-rig per-frame (gather+kernel)", static_rig_frame,
           order, sk, height, context)


if __name__ == "__main__":
    main()
