"""BEV voxel pooling (lift-splat scatter-add) — TPU-native.

Two entry points:

* `voxel_pooling(geom_xyz, features, voxel_num)` — generic sum-pooling of
  per-point features into a BEV grid. Semantics match the reference CUDA op
  (/root/reference/ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:9-56):
  every point whose integer voxel coordinate is inside the grid contributes
  its feature vector to its (y, x) cell; z is collapsed. Unlike the CUDA
  `atomicAdd` (whose float accumulation order is nondeterministic), the XLA
  scatter-add is deterministic — bit-identical results across runs.

* `lift_splat_pool(height, context, cell_index, ...)` — the fused path used
  by the model: computes `height[d,h,w] * context[h,w,:]` on the fly inside a
  chunked scan and scatters straight into the BEV grid, never materialising
  the (D, fH, fW, C) outer-product tensor the reference materialises
  (/root/reference/layers/backbones/lss_fpn.py:464-466). A custom VJP makes
  the backward a pair of gathers (mirroring the reference backward's
  pos_memo gather, /root/reference/ops/voxel_pooling/voxel_pooling.py:57-69)
  plus a D-axis reduction — no scatter in the context gradient at all.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    """Opt-in Pallas forward kernel (SGV3D_TPU_PALLAS=1).

    The kernel's sorted-segment accumulation beats XLA's scatter 3x in
    isolation, but the sort + payload-gather prep currently offsets the win
    end-to-end (35.8 vs 37.5 img/s on BEVHeight-r101); kept opt-in until the
    prep is fused. It is also the deterministic-order reference for the
    scatter math."""
    return os.environ.get("SGV3D_TPU_PALLAS") == "1"


def flatten_voxel_index(geom_xyz: jnp.ndarray, voxel_num: tuple[int, int, int]) -> jnp.ndarray:
    """Integer voxel coords (..., 3) -> flat BEV cell index y*X + x.

    Out-of-range points (any of x, y, z outside the grid) map to the sentinel
    index Y*X (one past the grid), which callers use as a trash cell.
    """
    num_x, num_y, num_z = int(voxel_num[0]), int(voxel_num[1]), int(voxel_num[2])
    x, y, z = geom_xyz[..., 0], geom_xyz[..., 1], geom_xyz[..., 2]
    valid = (
        (x >= 0) & (x < num_x) & (y >= 0) & (y < num_y) & (z >= 0) & (z < num_z)
    )
    flat = y * num_x + x
    return jnp.where(valid, flat, num_y * num_x).astype(jnp.int32)


def voxel_pooling(geom_xyz: jnp.ndarray, features: jnp.ndarray,
                  voxel_num: tuple[int, int, int]) -> jnp.ndarray:
    """Sum-pool per-point features into a BEV grid.

    Args:
      geom_xyz: (B, P, 3) int32 voxel coords.
      features: (B, P, C) float features.
      voxel_num: static (X, Y, Z) grid extents.

    Returns:
      (B, Y, X, C) float BEV map (NHWC; the reference returns NCHW).
    """
    num_x, num_y = int(voxel_num[0]), int(voxel_num[1])
    b, p, c = features.shape
    cell = flatten_voxel_index(geom_xyz, voxel_num)  # (B, P)
    out = jnp.zeros((b, num_y * num_x + 1, c), features.dtype)
    out = out.at[jnp.arange(b)[:, None], cell].add(features)
    return out[:, : num_y * num_x].reshape(b, num_y, num_x, c)


# ---------------------------------------------------------------------------
# Fused lift-splat pooling
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lift_splat_pool(height: jnp.ndarray, context: jnp.ndarray,
                    cell_index: jnp.ndarray, batch: int, num_cells: int,
                    d_chunk: int = 10) -> jnp.ndarray:
    """Fused `outer(height, context)` + BEV scatter-add.

    Args:
      height:     (N, D, HW) float32 height-bin probabilities (N = B*num_cams).
      context:    (N, HW, C) float32 context features.
      cell_index: (N, D, HW) int32 flat cell index in [0, num_cells] where
                  `num_cells` itself is the trash cell for out-of-range points.
      batch:      static B. N must be divisible by batch; camera n contributes
                  to BEV grid n // (N // batch).
      num_cells:  static Y*X.
      d_chunk:    static number of height bins processed per scan step; bounds
                  peak memory at N*d_chunk*HW*C instead of N*D*HW*C.

    Returns:
      (B, num_cells, C) float32 BEV features.
    """
    return _lift_splat_fwd(height, context, cell_index, batch, num_cells, d_chunk)[0]


def _lift_splat_fwd(height, context, cell_index, batch, num_cells, d_chunk):
    n, d, hw = height.shape
    c = context.shape[-1]
    cams_per_b = n // batch
    if _use_pallas():
        from sgv3d_tpu.ops.pallas_lift_splat import pallas_lift_splat_forward
        out = pallas_lift_splat_forward(
            height.astype(jnp.float32), context.astype(jnp.float32),
            cell_index, batch, num_cells)
        return out, (height, context, cell_index)
    # Global cell index: offset each camera's cells by its batch element.
    batch_of_cam = jnp.arange(n, dtype=jnp.int32) // cams_per_b  # (N,)
    gcell = cell_index + (batch_of_cam * (num_cells + 1))[:, None, None]
    # Trash rows interleave per batch element; allocate B*(num_cells+1) rows.
    out = jnp.zeros((batch * (num_cells + 1), c), jnp.float32)

    num_chunks = -(-d // d_chunk)
    pad_d = num_chunks * d_chunk - d
    if pad_d:
        height = jnp.pad(height, ((0, 0), (0, pad_d), (0, 0)))
        # Padded bins carry zero weight; send them to the first trash cell.
        gcell = jnp.pad(gcell, ((0, 0), (0, pad_d), (0, 0)),
                        constant_values=num_cells)
    h_chunks = height.reshape(n, num_chunks, d_chunk, hw).transpose(1, 0, 2, 3)
    i_chunks = gcell.reshape(n, num_chunks, d_chunk, hw).transpose(1, 0, 2, 3)

    def step(acc, chunk):
        h_c, i_c = chunk  # (N, d_chunk, HW), (N, d_chunk, HW)
        feats = h_c[..., None] * context[:, None, :, :]  # (N, dc, HW, C)
        acc = acc.at[i_c.reshape(-1)].add(
            feats.reshape(-1, c).astype(jnp.float32))
        return acc, None

    out, _ = jax.lax.scan(step, out, (h_chunks, i_chunks))
    out = out.reshape(batch, num_cells + 1, c)[:, :num_cells]
    return out, (height[:, :d], context, cell_index)


def _lift_splat_bwd(batch, num_cells, d_chunk, residuals, g):
    height, context, cell_index = residuals
    d = cell_index.shape[1]
    n, _, hw = height.shape
    c = context.shape[-1]
    # one padding rule for BOTH height and gcell — they must stay in
    # lockstep or the scan zips misaligned chunks (code review r5)
    num_chunks = -(-d // d_chunk)
    pad_d = num_chunks * d_chunk - d
    if pad_d:
        height = jnp.pad(height, ((0, 0), (0, pad_d), (0, 0)))
    cams_per_b = n // batch
    g = g.astype(jnp.float32)
    # Pad g with a zero trash row per batch element so out-of-range points get
    # zero gradient — the gather-based backward of the reference.
    g_pad = jnp.concatenate(
        [g, jnp.zeros((batch, 1, c), jnp.float32)], axis=1
    ).reshape(batch * (num_cells + 1), c)

    batch_of_cam = jnp.arange(n, dtype=jnp.int32) // cams_per_b
    gcell = cell_index + (batch_of_cam * (num_cells + 1))[:, None, None]
    gcell_p = jnp.pad(gcell, ((0, 0), (0, pad_d), (0, 0)),
                      constant_values=num_cells) if pad_d else gcell
    h_chunks = height.reshape(n, num_chunks, d_chunk, hw).transpose(1, 0, 2, 3)
    i_chunks = gcell_p.reshape(n, num_chunks, d_chunk, hw).transpose(1, 0, 2, 3)

    def step(d_ctx, chunk):
        h_c, i_c = chunk
        g_rows = g_pad[i_c]                       # (N, dc, HW, C) gather
        d_h = jnp.einsum("ndpc,npc->ndp", g_rows, context)
        d_ctx = d_ctx + jnp.einsum("ndpc,ndp->npc", g_rows, h_c)
        return d_ctx, d_h

    d_ctx, d_h_chunks = jax.lax.scan(
        step, jnp.zeros((n, hw, c), jnp.float32), (h_chunks, i_chunks))
    d_height = d_h_chunks.transpose(1, 0, 2, 3).reshape(n, num_chunks * d_chunk, hw)
    return d_height[:, :d], d_ctx, None


lift_splat_pool.defvjp(_lift_splat_fwd, _lift_splat_bwd)


def cull_pixel_indices(valid_pix_np, bucket: int = 512,
                       min_trash_frac: float = 0.05):
    """Host-side index selection for static-rig pixel culling.

    valid_pix_np: (HW,) bool — pixel has ANY in-grid cell in ANY camera
    (the batch union; compute it on device and fetch just these HW bools —
    fetching the full (BN, HW, D) cells through a TPU relay costs minutes
    at BSM scale). Returns (pix_keep (HWb,) int32, n_valid) with HWb a
    `bucket` multiple (bounding recompiles to one per bucket size; padded
    entries duplicate pixel 0 and must be masked to the trash cell by the
    caller), or None when culling is not worthwhile.
    """
    import numpy as np

    valid_pix_np = np.asarray(valid_pix_np)
    hw = valid_pix_np.shape[0]
    keep = np.nonzero(valid_pix_np)[0].astype(np.int32)
    if len(keep) > (1.0 - min_trash_frac) * hw:
        return None
    # keep the bucket granularity proportionate at toy sizes (8-aligned)
    bucket = -(-min(bucket, max(8, -(-hw // 8))) // 8) * 8
    pad = -(-max(len(keep), 1) // bucket) * bucket - len(keep)
    pix_keep = np.concatenate([keep, np.zeros(pad, np.int32)])
    if len(pix_keep) >= hw:                                      # padding won
        return None
    return pix_keep, len(keep)


@functools.partial(jax.jit, static_argnums=(3,))
def apply_pixel_cull(cells, pix_keep, n_valid, num_cells: int):
    """Device-side companion of `cull_pixel_indices`: gather the culled
    (BN, HWb, D) cells and send the padded rows to the trash cell.

    `cells` must be in the top-k (BN, HW, D) layout. Jitted at module level
    with `n_valid` TRACED (two rigs sharing a pix_keep bucket size then
    share one executable — marking it static would recompile per distinct
    valid count, defeating the bucketing; code review r5)."""
    culled = jnp.take(cells, jnp.asarray(pix_keep), axis=1)
    mask = (jnp.arange(culled.shape[1]) < n_valid)[None, :, None]
    return jnp.where(mask, culled, jnp.int32(num_cells))


def cull_static_cells(cells_np, num_cells: int, bucket: int = 512,
                      min_trash_frac: float = 0.05):
    """Numpy reference implementation of the static-rig pixel cull
    (`cull_pixel_indices` + `apply_pixel_cull` composed on host arrays) —
    used by the equivalence probe and the unit tests. The serving path
    composes the two pieces instead so the cells gather stays on device.

    For a fixed roadside rig some pixels' ENTIRE height-bin ray lands outside
    the BEV grid (sky above the horizon, road beyond the range; ~18.5% of
    r101 pixels on the bench rig). The top-k and the scatter are row-bound,
    so dropping those pixels STATICALLY — the per-rig cell cache makes the
    valid set a constant — shrinks both. Row order is preserved, so the
    scatter's per-cell accumulation order and hence the lift output are
    bit-identical (tools/probe_pixel_cull.py asserts this on-chip).

    Args:
      cells_np: (BN, HW, D) int32 host array from `compute_lift_cells` in
        top-k layout, with `num_cells` as the trash index.
      num_cells: the trash index (= Y*X).
      bucket: pad the kept-pixel count up to a multiple of this, bounding
        recompiles to one per bucket size; padded rows duplicate pixel 0 but
        carry all-trash cells, contributing nothing.
      min_trash_frac: return None (cull not worthwhile) when fewer than this
        fraction of pixels is fully-trash across the batch union.

    Returns:
      None, or (cells_culled (BN, HWv, D) int32, pix_keep (HWv,) int32) as
      numpy arrays; gather height/context rows with `pix_keep` before
      `topk_lift_inputs_hwd`.
    """
    import numpy as np

    cells_np = np.asarray(cells_np)
    # union of per-camera valid pixels: correct even if the batch mixes rigs
    valid_pix = (cells_np < num_cells).any(axis=(0, 2))          # (HW,)
    out = cull_pixel_indices(valid_pix, bucket, min_trash_frac)
    if out is None:
        return None
    pix_keep, n_valid = out
    culled = cells_np[:, pix_keep, :].copy()
    culled[:, n_valid:, :] = num_cells                           # pad -> trash
    return culled, pix_keep


def topk_lift_inputs(height: jnp.ndarray, cell_index: jnp.ndarray,
                     k: int, method: str = "auto"
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deployment knob: keep only the top-k height bins per pixel.

    The DID softmax concentrates most probability mass in a few bins, so
    pooling only the top-k (e.g. 16 of 90) cuts scatter points ~6x with
    negligible output change. Exact when k == D. Returns reduced
    (height (N, k, HW), cell_index (N, k, HW)).

    Methods: "auto" (default) = the exact Pallas kernel on TPU
    (ops/pallas_topk.py — one VMEM-resident pass vs the slow XLA TopK custom
    call) and `lax.top_k` elsewhere; "pallas"/"exact"/"approx" force a
    specific implementation ("approx" = `lax.approx_max_k`, >=0.95 recall of
    the top-k set — acceptable because the scatter is order-independent and
    top-k is itself an approximation)."""
    n, d, hw = height.shape
    if k >= d:
        return height, cell_index
    # top_k over the bin axis per (camera, pixel)
    return topk_lift_inputs_hwd(height.transpose(0, 2, 1),
                                cell_index.transpose(0, 2, 1), k, method)


def topk_lift_inputs_hwd(height_hwd: jnp.ndarray, cell_hwd: jnp.ndarray,
                         k: int, method: str = "auto"
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`topk_lift_inputs` for inputs already in (N, HW, D) layout.

    The model's NHWC height tensor and an (fH, fW, D)-ordered frustum give
    this layout for free, skipping two full (N, HW, D)-sized transposes
    (which dominated the top-k stage cost: D=90 is lane-unaligned, so the
    transpose is shuffle-bound). Returns (N, k, HW) arrays (the pooling
    layout; transposing the k-sized outputs is ~6x cheaper than the inputs).
    """
    n, hw, d = height_hwd.shape
    if k >= d:
        return height_hwd.transpose(0, 2, 1), cell_hwd.transpose(0, 2, 1)
    if method == "auto":
        method = "pallas" if (jax.default_backend() == "tpu"
                              and d <= 128) else "exact"
    if method == "pallas":
        from sgv3d_tpu.ops.pallas_topk import pallas_topk_with_cells
        return pallas_topk_with_cells(height_hwd.astype(jnp.float32),
                                      cell_hwd, k)
    if method == "approx" and d >= 32:
        # >= 0.95 recall of the top-k set; at deploy scale (16 of 90) the
        # rare miss is the set's smallest element — negligible mass. At toy
        # scales (k ~ d/2) a miss costs real mass, so fall back to exact.
        vals, idx = jax.lax.approx_max_k(height_hwd, k, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(height_hwd, k)   # (N, HW, k)
    cells_t = jnp.take_along_axis(cell_hwd, idx, axis=-1)
    return vals.transpose(0, 2, 1), cells_t.transpose(0, 2, 1)
