"""Pallas TPU kernel for the lift-splat BEV pooling forward pass.

Why: XLA lowers the scatter-add over ~3.7M (point -> BEV cell) updates to a
serialised row-update loop (~99 ms for BEVHeight-r101 batch 8 — the single
hottest op in the model). This kernel reformulates the scatter as
*sorted-segment accumulation*:

  1. XLA side (fast vector ops): sort points by cell id, gather each point's
     context row, scale by its height weight -> `vals` (P, C) in sorted order.
  2. Pallas kernel: stream sorted chunks; within a chunk all keys fall in a
     narrow window [k0, k0 + W) (they are sorted), so the accumulation is a
     transposed one-hot matmul `onehot_T @ vals` on the MXU plus one aligned
     dynamic-slice add into a VMEM-resident accumulator — no per-row scatter.
     Chunks whose key span exceeds one window (sparse regions) simply run
     additional window passes (still fully vectorised), preserving exactness.

The grid iterates (camera, chunk); the output block for a camera persists in
VMEM across its chunk steps (sequential TPU grid), so the full (cells, C)
accumulator never round-trips HBM. Out-of-range points sort to the trash key
(= num_cells) at the end and land in slack rows that are sliced off — no
masking needed.

Deterministic (fixed accumulation order), unlike the reference CUDA
`atomicAdd` (/root/reference/ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:31).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048            # points per grid step
SUB = 256               # lane width of the key layout; CHUNK = 8 * SUB
WINDOW = 512            # key window for the one-hot matmul fast path


def _kernel(keys_ref, vals_ref, out_ref, acc_ref, sem):
    cam = pl.program_id(0)
    chunk = pl.program_id(1)
    num_chunks = pl.num_programs(1)

    @pl.when(chunk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    keys2 = keys_ref[0, 0]                        # (8, SUB) int32, sorted
    vals = vals_ref[0, 0]                         # (CHUNK, C) float32
    k0 = keys2[0, 0]
    k0a = (k0 // 8) * 8                           # sublane-aligned base
    last = keys2[7, SUB - 1]
    # Number of WINDOW-wide passes covering [k0a, last]; after sorting a
    # chunk's span is ~cells * CHUNK / P, so this is 1 for dense regions.
    num_windows = (last - k0a) // WINDOW + 1
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, SUB), 0)
    # Values arrive bf16 (the context itself comes from bf16 convs); the
    # one-hot is exact in bf16 and the MXU accumulates in fp32.
    vals_b = vals.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    def window_pass(w, _):
        base = k0a + w * WINDOW
        local = jnp.zeros((WINDOW, vals.shape[-1]), jnp.float32)
        for s in range(CHUNK // SUB):
            rel_row = keys2[s:s + 1, :] - base              # (1, SUB)
            onehot_t = (rel_row == win_iota).astype(jnp.bfloat16)
            local = local + jax.lax.dot_general(
                onehot_t, vals_b[s * SUB:(s + 1) * SUB, :], dn,
                preferred_element_type=jnp.float32)
        cur = acc_ref[pl.ds(base, WINDOW), :]
        acc_ref[pl.ds(base, WINDOW), :] = cur + local
        return 0

    jax.lax.fori_loop(0, num_windows, window_pass, 0)

    # Flush the camera's accumulator to HBM on its last chunk.
    @pl.when(chunk == num_chunks - 1)
    def _flush():
        dma = pltpu.make_async_copy(acc_ref, out_ref.at[cam], sem)
        dma.start()
        dma.wait()


@functools.partial(jax.jit, static_argnums=(2,))
def pallas_sorted_segment_pool(keys: jnp.ndarray, vals: jnp.ndarray,
                               num_cells: int) -> jnp.ndarray:
    """keys (N, num_chunks, 8, SUB) sorted int32 (flattened row-major);
    vals (N, num_chunks, CHUNK, C) float32 -> (N, num_cells, C) float32."""
    n, num_chunks = keys.shape[:2]
    c = vals.shape[-1]
    rows = num_cells + WINDOW + 8  # slack for trash key + alignment
    rows = -(-rows // 8) * 8

    out = pl.pallas_call(
        _kernel,
        grid=(n, num_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 8, SUB), lambda cam, ch: (cam, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK, c), lambda cam, ch: (cam, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # The accumulator lives in a single VMEM scratch (a VMEM-resident
        # output block would be double-buffered and overflow VMEM); the
        # output stays in HBM and receives one DMA per camera.
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, rows, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rows, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(keys, vals)
    return out[:, :num_cells]


def pallas_lift_splat_forward(height: jnp.ndarray, context: jnp.ndarray,
                              cell_index: jnp.ndarray, batch: int,
                              num_cells: int) -> jnp.ndarray:
    """Drop-in forward for lift_splat_pool (see ops/voxel_pooling.py).

    height (N, D, HW) fp32; context (N, HW, C) fp32; cell_index (N, D, HW)
    int32 with num_cells as the trash key -> (B, num_cells, C) fp32.
    """
    n, d, hw = height.shape
    c = context.shape[-1]
    p = d * hw
    cams_per_b = n // batch

    keys = cell_index.reshape(n, p)
    h_flat = height.reshape(n, p)

    num_chunks = -(-p // CHUNK)
    p_pad = num_chunks * CHUNK
    c_pad = -(-c // 128) * 128  # 128-lane tile so the accumulator DMA aligns

    def prep(k, h, ctx):
        sk, order = jax.lax.sort_key_val(k, jnp.arange(p, dtype=jnp.int32))
        h_sorted = jnp.take(h, order)
        pix = order % hw
        # Gather + scale in one pass, directly into the padded bf16 buffer
        # (padded points carry zero values; padded keys repeat the maximum so
        # chunk spans stay tight).
        vals = (h_sorted[:, None] * jnp.take(ctx, pix, axis=0)
                ).astype(jnp.bfloat16)
        vals_p = jnp.zeros((p_pad, c_pad), jnp.bfloat16)
        vals_p = jax.lax.dynamic_update_slice(vals_p, vals, (0, 0))
        sk_p = jnp.full((p_pad,), sk[-1], jnp.int32)
        sk_p = jax.lax.dynamic_update_slice(sk_p, sk, (0,))
        return sk_p, vals_p

    sk, vals = jax.vmap(prep)(keys, h_flat, context.astype(jnp.float32))
    sk = sk.reshape(n, num_chunks, 8, SUB)
    vals = vals.reshape(n, num_chunks, CHUNK, c_pad)

    per_cam = pallas_sorted_segment_pool(sk, vals, num_cells)[..., :c]
    if cams_per_b == 1:
        return per_cam
    return per_cam.reshape(batch, cams_per_b, num_cells, c).sum(axis=1)
