#!/usr/bin/env python
"""Probe a lane-parallel reformulation of the lift-splat fwd/bwd.

Idea: the exact-lift scatter/gather moves P = D*HW points with arbitrary BEV
cell targets. Keeping HW in the lane dimension, every per-point access is
*along axis 0 of a (cells+1, HW) matrix with per-lane indices*:

  fwd:   M[cell[d,q], q] += h[d,q]      (columnwise scalar scatter-add)
         out = M[:cells].T-free matmul   M^T? no: out[r,c] = sum_q M[r,q]*ctx[q,c]
                                         = (M @ ctx)  ~60 GFLOP -> ~2 ms MXU
  bwd:   M2 = g @ ctx^T                  (~60 GFLOP)
         d_h[d,q] = M2[cell[d,q], q]    (columnwise scalar gather)
         d_ctx    = M^T @ g              (M rebuilt by the same scatter)

If XLA lowers the columnwise scalar scatter/gather lane-parallel (128 lanes
at once) instead of one row per update, the whole exact lift drops from
~180 ms/step to a few ms of matmuls. This script measures exactly those two
primitives plus the matmuls at BSM-bs2 scale.

MEASURED (v5e, 2026-08-17): CLOSED.
  (a) columnwise scalar scatter  72.4 ms  — XLA does NOT vectorise scalar
      updates along lanes; barely better than the row scatter (90 ms) and
      the scheme needs TWO of them (fwd M-build + bwd d_ctx M-rebuild).
  (b) columnwise scalar gather via take_along_axis(axis=0) on a
      (16385, 20736) operand did not complete within a 900 s timeout —
      pathologically slower still.
So 2*(a) + (b) + matmuls >> the current ~140 ms fwd+bwd. Dead end.

Run on TPU: python tools/profile_lift_lanewise.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

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
    print(f"{name:52s} {dt:8.1f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.random((N, D, HW), np.float32))
    ctx = jnp.asarray(rng.random((N, HW, C), np.float32))
    cell = jnp.asarray(rng.integers(0, CELLS + 1, (N, D, HW)).astype(np.int32))
    g = jnp.asarray(rng.random((N, CELLS + 1, C), np.float32))
    m = jnp.asarray(rng.random((N, CELLS + 1, HW), np.float32)).astype(jnp.bfloat16)

    # (a) columnwise scalar scatter-add: M[cell[d,q], q] += h[d,q]
    def col_scatter(cell_, h_):
        def one(cc, hh):
            out = jnp.zeros((CELLS + 1, HW), jnp.float32)
            q = jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None, :],
                                 cc.shape)
            return out.at[cc, q].add(hh)
        return jax.vmap(one)(cell_, h_)
    jcs = jax.jit(lambda c_, h_: ssum(col_scatter(c_, h_)))
    a = timeit("(a) columnwise scalar scatter (D,HW)->(cells,HW)", jcs,
               cell, h)

    # (b) columnwise scalar gather: d_h[d,q] = M2[cell[d,q], q]
    m2 = jnp.asarray(rng.random((N, CELLS + 1, HW), np.float32))

    def col_gather(m_, cell_):
        def one(mm, cc):
            return jnp.take_along_axis(mm, cc, axis=0)
        return jax.vmap(one)(m_, cell_)
    jcg = jax.jit(lambda m_, c_: ssum(col_gather(m_, c_)))
    b = timeit("(b) columnwise scalar gather (cells,HW)->(D,HW)", jcg,
               m2, cell)

    # (c) the matmuls: M @ ctx and g @ ctx^T (bf16 on the MXU)
    def matmuls(m_, ctx_, g_):
        out = jnp.einsum("nrq,nqc->nrc", m_, ctx_.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        m2_ = jnp.einsum("nrc,nqc->nrq", g_.astype(jnp.bfloat16),
                         ctx_.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out, m2_
    jm = jax.jit(lambda m_, ctx_, g_: ssum(matmuls(m_, ctx_, g_)))
    c = timeit("(c) M@ctx + g@ctx^T matmuls (2x ~60 GFLOP)", jm, m, ctx, g)

    print()
    print(f"lane-parallel exact lift fwd+bwd would be ~ {2*a + b + 1.5*c:.1f}"
          f" ms (2 scatters + 1 gather + matmuls)")


if __name__ == "__main__":
    main()
