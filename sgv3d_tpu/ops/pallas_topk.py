"""Pallas TPU kernel: exact top-k height bins per pixel + paired cell ids.

Why: `lax.top_k` over the 90-bin axis of the (N, HW, D) height tensor lowers
to XLA's TopK custom call — measured ~15 ms net for BEVHeight-r101 batch 8
(tools/profile_model.py), as large as the BEV scatter it feeds. The selection
is tiny arithmetic on a 15 MB tensor, so a VMEM-resident kernel is purely
bandwidth-bound: read each (row, bin) tile once, run k masked max-reduction
rounds on-chip, write the k selected (value, cell) pairs.

Matches `lax.top_k` exactly (descending values, lowest-bin-index
tie-breaking), and extracts the cell id of each selected bin in the same
round — replacing the separate `take_along_axis` gather. Outputs land
directly in the (N, k, HW) layout the BEV scatter consumes, so the
(N, HW, k)->(N, k, HW) transposes disappear too.

Reference context: the top-k lift is this framework's deploy-time
approximation of /root/reference/layers/backbones/lss_fpn.py:464-476 (which
always pools all 90 bins); see ops/voxel_pooling.py:topk_lift_inputs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 512          # pixels per grid step
LANES = 128         # padded bin axis (D <= 128)
NEG_INF = float("-inf")


def _kernel(k: int, hp_ref, cell_ref, vals_ref, cells_ref):
    rem = hp_ref[0]                               # (ROWS, LANES) fp32
    cells = cell_ref[0]                           # (ROWS, LANES) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, rem.shape, 1)
    for i in range(k):
        m = jnp.max(rem, axis=1, keepdims=True)             # (ROWS, 1)
        tied = rem == m
        first = jnp.min(jnp.where(tied, lane, LANES), axis=1,
                        keepdims=True)
        sel = lane == first                                  # one bin per row
        vals_ref[0, i, :] = m[:, 0]
        cells_ref[0, i, :] = jnp.sum(jnp.where(sel, cells, 0), axis=1)
        rem = jnp.where(sel, NEG_INF, rem)


@functools.partial(jax.jit, static_argnums=(2, 3))
def pallas_topk_with_cells(height_hwd: jnp.ndarray, cell_hwd: jnp.ndarray,
                           k: int, interpret: bool = False
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k along the last axis with paired payload extraction.

    Args:
      height_hwd: (N, HW, D) float32, D <= 128.
      cell_hwd:   (N, HW, D) int32 payload (BEV cell ids).
      k:          static number of bins to keep.

    Returns:
      (vals (N, k, HW) float32 descending, cells (N, k, HW) int32) — equal to
      `lax.top_k` + `take_along_axis` (+ transpose), with its tie-breaking.
    """
    n, hw, d = height_hwd.shape
    if d > LANES:
        raise ValueError(f"D={d} exceeds the {LANES}-lane kernel layout")
    hw_pad = -(-hw // ROWS) * ROWS
    hp = jnp.full((n, hw_pad, LANES), NEG_INF, jnp.float32)
    hp = jax.lax.dynamic_update_slice(
        hp, height_hwd.astype(jnp.float32), (0, 0, 0))
    cl = jnp.zeros((n, hw_pad, LANES), jnp.int32)
    cl = jax.lax.dynamic_update_slice(cl, cell_hwd, (0, 0, 0))

    k_pad = -(-k // 8) * 8  # fp32 sublane granularity of the output block
    vals, cells = pl.pallas_call(
        functools.partial(_kernel, k),
        grid=(n, hw_pad // ROWS),
        in_specs=[
            pl.BlockSpec((1, ROWS, LANES), lambda cam, r: (cam, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS, LANES), lambda cam, r: (cam, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k_pad, ROWS), lambda cam, r: (cam, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, ROWS), lambda cam, r: (cam, 0, r),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k_pad, hw_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, k_pad, hw_pad), jnp.int32),
        ],
        interpret=interpret,
    )(hp, cl)
    return vals[:, :k, :hw], cells[:, :k, :hw]
