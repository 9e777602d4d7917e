#!/usr/bin/env python
"""Measure the primitive costs of the sorted/amortized lift-splat VJP
proposal (VERDICT r2 next-step #3) at training scale.

The proposal: build the cell-sorted CSR once per step inside the custom VJP,
run the Pallas sorted-segment kernel forward, and reuse the sort in the
backward. Whether it can win is decided by primitive costs at BSM-bs2 scale
(N=2 cams, D=90 bins, HW=108x192 stride-8 pixels, C=88 channels, ~3.7M
points total):

  current fwd:  XLA scatter-add of P rows               (A)
  current bwd:  XLA row-gather of P rows + 2 einsums    (B)
  sorted prep:  sort_key_val over P keys                (C)
                row-gather of ctx by sorted pixel       (D)
  sorted bwd needs additionally:
                row-scatter of P rows by pixel (d_ctx)  (E)
                unsort of P scalars (d_height)          (F)

The sorted scheme replaces {A} with {C + D + kernel} and its backward still
needs D (ctx rows again), E and F on top of the MXU-rate window passes. If
C + D + E alone exceed A + B's row-bound parts, the line is closed.

Run on TPU: python tools/profile_lift_bwd.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, D, HW, C = 2, 90, 108 * 192, 88
CELLS = 128 * 128
ITERS = 5


def fence(x):
    # every timed fn returns a scalar (on-device reduction): whole-array
    # fetches through the axon relay pay a minutes-long per-shape path setup
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0])))


def ssum(x):
    return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(x))


def timeit(name, fn, *args):
    out = fn(*args)
    fence(out)
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
        fence(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    height = jnp.asarray(rng.random((N, D, HW), np.float32))
    context = jnp.asarray(rng.random((N, HW, C), np.float32))
    cell = jnp.asarray(rng.integers(0, CELLS + 1, (N, D, HW)).astype(np.int32))
    g = jnp.asarray(rng.random((N, CELLS, C), np.float32))

    from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool

    P = D * HW

    # A: current forward (chunked scan scatter)
    def fwd(h, ctx, c_):
        return ssum(lift_splat_pool(h, ctx, c_, N, CELLS))
    jfwd = jax.jit(fwd)
    a = timeit("A  current fwd (XLA scatter)", jfwd, height, context, cell)

    # A+B: forward + backward via the custom VJP
    def fwdbwd(h, ctx, c_, gg):
        out, vjp = jax.vjp(lambda hh, cc: lift_splat_pool(hh, cc, c_, N, CELLS),
                           h, ctx)
        # ssum(out) keeps the forward scatter live — without it XLA DCEs the
        # whole forward (residuals don't include the output) and A+B < A.
        return ssum(out) + ssum(vjp(gg))
    jfb = jax.jit(fwdbwd)
    ab = timeit("A+B current fwd+bwd (scatter + gather)", jfb, height,
                context, cell, g)
    print(f"   -> implied bwd (B) ~ {ab - a:.1f} ms")

    # C: sort P keys per camera
    keys = cell.reshape(N, P)

    def sort_keys(k):
        return jax.vmap(lambda kk: jax.lax.sort_key_val(
            kk, jnp.arange(P, dtype=jnp.int32)))(k)
    jsort = jax.jit(sort_keys)
    c = timeit("C  sort_key_val P keys",
               jax.jit(lambda k: ssum(sort_keys(k)[0])), keys)

    # D: gather ctx rows by (sorted) pixel order (order stays on device)
    order = jax.jit(lambda k: sort_keys(k)[1])(keys)

    def gather_ctx(ctx, order_):
        pix = order_ % HW
        return jax.vmap(lambda cc, pp: jnp.take(cc, pp, axis=0))(ctx, pix)
    jg = jax.jit(lambda ctx, o: ssum(gather_ctx(ctx, o)))
    d = timeit("D  row-gather ctx by sorted pixel", jg, context, order)

    # E: scatter rows by pixel (sorted-backward d_ctx accumulation)
    vals = jax.jit(gather_ctx)(context, order)

    def scatter_pix(v, order_):
        pix = order_ % HW
        out = jnp.zeros((N, HW, C), jnp.float32)
        return jax.vmap(lambda o, pp, vv: o.at[pp].add(vv))(out, pix, v)
    jsc = jax.jit(lambda v, o: ssum(scatter_pix(v, o)))
    e = timeit("E  row-scatter P rows by pixel (d_ctx)", jsc, vals, order)

    # F: unsort P scalars (d_height back to (D, HW) layout)
    dh_sorted = jnp.asarray(rng.random((N, P), np.float32))

    def unsort(v, order_):
        out = jnp.zeros((N, P), jnp.float32)
        return jax.vmap(lambda o, oo, vv: o.at[oo].set(vv))(out, order_, v)
    jun = jax.jit(lambda v, o: ssum(unsort(v, o)))
    f = timeit("F  scalar-scatter unsort P values (d_h)", jun, dh_sorted, order)

    print()
    print(f"sorted-scheme fixed overhead C+D:        {c + d:8.1f} ms "
          f"(vs A = {a:.1f})")
    print(f"sorted-backward extra D+E+F:             {d + e + f:8.1f} ms "
          f"(vs B ~ {ab - a:.1f})")
    verdict = ("CLOSED: prep+reorder costs exceed what the kernel can save"
               if (c + d) + (d + e + f) > ab else
               "OPEN: amortized scheme has headroom, build the bwd kernel")
    print(verdict)


if __name__ == "__main__":
    main()
