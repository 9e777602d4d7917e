#!/usr/bin/env python
"""Spike: can Mosaic lower an in-kernel row gather from VMEM, and how fast?

Tests three candidate formulations for gathering context rows by pixel id
inside the lift-splat kernel (the step that currently forces an XLA-side
(P, C) payload materialisation):

  a) jnp.take(ctx, idx, axis=0)           — general gather
  b) jnp.take_along_axis(ctx, idx[:, None], axis=0) — broadcasted TAA
  c) one_hot(idx) @ ctx                   — MXU fallback (always works)

Run: python tools/spike_pallas_gather.py  (TPU)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW, C, M = 5184, 128, 2048   # ctx rows, channels, points per chunk
N_CHUNKS = 40


def _kernel_take(ctx_ref, idx_ref, out_ref):
    ch = pl.program_id(0)
    idx = idx_ref[ch]                 # (M,) int32 in VMEM
    out_ref[0] = jnp.take(ctx_ref[...], idx, axis=0)


def _kernel_taa(ctx_ref, idx_ref, out_ref):
    ch = pl.program_id(0)
    idx = idx_ref[ch]                 # (M,)
    out_ref[0] = jnp.take_along_axis(
        ctx_ref[...], idx[:, None], axis=0)


def _kernel_onehot(ctx_ref, idx_ref, out_ref):
    ch = pl.program_id(0)
    idx = idx_ref[ch].reshape(M, 1)
    # (M, HW) one-hot @ (HW, C): 2048x5184x128 MACs per chunk
    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (M, HW), 1)
    onehot = (hw_iota == idx).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        onehot, ctx_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def run(kernel, name, ctx, idx):
    try:
        fn = pl.pallas_call(
            kernel,
            grid=(N_CHUNKS,),
            in_specs=[
                pl.BlockSpec((HW, C), lambda ch: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, C), lambda ch: (ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N_CHUNKS, M, C), jnp.bfloat16),
        )
        fn = jax.jit(fn)
        out = fn(ctx, idx)
        np.asarray(out[0, 0, 0])
        np.asarray(fn(ctx, idx)[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            np.asarray(fn(ctx, idx)[0, 0, 0])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        # correctness
        ref = np.asarray(ctx)[np.asarray(idx)]
        got = np.asarray(out)
        ok = np.allclose(ref, got, atol=1e-2)
        print(f"{name:14s} {dt:8.2f} ms  correct={ok}", flush=True)
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


def main():
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.normal(size=(HW, C)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, HW, size=(N_CHUNKS, M)).astype(np.int32))
    run(_kernel_take, "take", ctx, idx)
    run(_kernel_taa, "take_along", ctx, idx)
    run(_kernel_onehot, "onehot-mxu", ctx, idx)


if __name__ == "__main__":
    main()
