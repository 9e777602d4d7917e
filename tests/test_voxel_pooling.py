"""Voxel pooling vs dense numpy oracle + custom-VJP gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.ops.voxel_pooling import (
    flatten_voxel_index, lift_splat_pool, voxel_pooling)


def _oracle_pool(geom_xyz, feats, voxel_num):
    X, Y, _Z = voxel_num
    b, p, c = feats.shape
    out = np.zeros((b, Y, X, c), np.float32)
    for bi in range(b):
        for pi in range(p):
            x, y, z = geom_xyz[bi, pi]
            if 0 <= x < X and 0 <= y < Y and 0 <= z < voxel_num[2]:
                out[bi, y, x] += feats[bi, pi]
    return out


def test_voxel_pooling_matches_oracle(rng):
    voxel_num = (16, 12, 1)
    b, p, c = 2, 300, 5
    geom_xyz = rng.integers(-3, 20, size=(b, p, 3)).astype(np.int32)
    geom_xyz[..., 2] = rng.integers(-1, 2, size=(b, p))
    feats = rng.normal(size=(b, p, c)).astype(np.float32)
    out = voxel_pooling(jnp.asarray(geom_xyz), jnp.asarray(feats), voxel_num)
    expect = _oracle_pool(geom_xyz, feats, voxel_num)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)


def test_flatten_voxel_index_sentinel():
    idx = flatten_voxel_index(
        jnp.asarray([[0, 0, 0], [15, 11, 0], [16, 0, 0], [0, -1, 0], [0, 0, 1]]),
        (16, 12, 1),
    )
    np.testing.assert_array_equal(np.asarray(idx), [0, 16 * 12 - 1, 192, 192, 192])


def _lift_oracle(height, context, cell, batch, num_cells):
    n, d, hw = height.shape
    c = context.shape[-1]
    cams = n // batch
    out = np.zeros((batch, num_cells, c), np.float32)
    for ni in range(n):
        bi = ni // cams
        for di in range(d):
            for pi in range(hw):
                cl = cell[ni, di, pi]
                if cl < num_cells:
                    out[bi, cl] += height[ni, di, pi] * context[ni, pi]
    return out


def test_lift_splat_pool_matches_oracle(rng):
    n, d, hw, c = 4, 7, 30, 6
    batch, num_cells = 2, 25
    height = rng.random((n, d, hw)).astype(np.float32)
    context = rng.normal(size=(n, hw, c)).astype(np.float32)
    cell = rng.integers(0, num_cells + 1, size=(n, d, hw)).astype(np.int32)
    out = lift_splat_pool(
        jnp.asarray(height), jnp.asarray(context), jnp.asarray(cell),
        batch, num_cells, 3)
    expect = _lift_oracle(height, context, cell, batch, num_cells)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_lift_splat_equals_unfused(rng):
    """Fused path == materialise-then-voxel_pool path."""
    n, d, hw, c = 2, 5, 24, 8
    batch = 2
    voxel_num = (6, 4, 1)
    num_cells = 24
    height = rng.random((n, d, hw)).astype(np.float32)
    context = rng.normal(size=(n, hw, c)).astype(np.float32)
    geom_xyz = rng.integers(-1, 7, size=(n, d, hw, 3)).astype(np.int32)
    geom_xyz[..., 2] = 0

    cell = flatten_voxel_index(jnp.asarray(geom_xyz), voxel_num)
    fused = lift_splat_pool(
        jnp.asarray(height), jnp.asarray(context), cell, batch, num_cells, 2)

    dense = height[:, :, :, None] * context[:, None, :, :]  # (N, D, HW, C)
    out2 = voxel_pooling(
        jnp.asarray(geom_xyz.reshape(batch, -1, 3)),
        jnp.asarray(dense.reshape(batch, -1, c)), voxel_num)
    np.testing.assert_allclose(
        np.asarray(fused).reshape(batch, 4, 6, c), np.asarray(out2),
        rtol=1e-4, atol=1e-4)


def test_lift_splat_pool_grads(rng):
    n, d, hw, c = 2, 4, 12, 3
    batch, num_cells = 1, 10
    height = rng.random((n, d, hw)).astype(np.float32)
    context = rng.normal(size=(n, hw, c)).astype(np.float32)
    cell = rng.integers(0, num_cells + 1, size=(n, d, hw)).astype(np.int32)
    w = rng.normal(size=(batch, num_cells, c)).astype(np.float32)

    def loss_fused(h, ctx):
        return jnp.sum(lift_splat_pool(h, ctx, jnp.asarray(cell),
                                       batch, num_cells, 3) * w)

    def loss_ref(h, ctx):
        dense = h[:, :, :, None] * ctx[:, None, :, :]
        onehot = (cell[..., None] == np.arange(num_cells)).astype(np.float32)
        out = jnp.einsum("ndpc,ndpk->kc", dense, jnp.asarray(onehot))
        return jnp.sum(out[None] * w)

    gh, gc = jax.grad(loss_fused, argnums=(0, 1))(
        jnp.asarray(height), jnp.asarray(context))
    gh_ref, gc_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(height), jnp.asarray(context))
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref), rtol=1e-4, atol=1e-4)


def test_lift_splat_pool_jit_and_multibatch(rng):
    n, d, hw, c = 6, 9, 16, 4
    batch, num_cells = 3, 12
    height = jnp.asarray(rng.random((n, d, hw)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(n, hw, c)), jnp.float32)
    cell = jnp.asarray(rng.integers(0, num_cells + 1, size=(n, d, hw)), jnp.int32)
    f = jax.jit(lift_splat_pool, static_argnums=(3, 4, 5))
    out = f(height, context, cell, batch, num_cells, 4)
    expect = _lift_oracle(np.asarray(height), np.asarray(context),
                          np.asarray(cell), batch, num_cells)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_topk_hwd_layout_matches_dhw(rng):
    """topk_lift_inputs_hwd == topk_lift_inputs (exact method) up to the
    shared (N, k, HW) output layout."""
    from sgv3d_tpu.ops.voxel_pooling import (topk_lift_inputs,
                                             topk_lift_inputs_hwd)
    n, d, hw, k = 2, 12, 40, 4
    h = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, d, hw)),
                                   jnp.float32), axis=1)
    cells = jnp.asarray(rng.integers(0, 64, size=(n, d, hw)), jnp.int32)
    h1, c1 = topk_lift_inputs(h, cells, k, method="exact")
    h2, c2 = topk_lift_inputs_hwd(h.transpose(0, 2, 1),
                                  cells.transpose(0, 2, 1), k,
                                  method="exact")
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_topk_approx_covers_mass(rng):
    """approx_max_k keeps >= 95% of the probability mass exact top-k keeps
    (top-16 of a peaked softmax)."""
    from sgv3d_tpu.ops.voxel_pooling import topk_lift_inputs
    n, d, hw, k = 2, 90, 64, 16
    h = jax.nn.softmax(jnp.asarray(rng.normal(size=(n, d, hw)) * 3.0,
                                   jnp.float32), axis=1)
    cells = jnp.asarray(rng.integers(0, 64, size=(n, d, hw)), jnp.int32)
    h_ex, _ = topk_lift_inputs(h, cells, k, method="exact")
    h_ap, _ = topk_lift_inputs(h, cells, k, method="approx")
    mass_ex = float(h_ex.sum())
    mass_ap = float(h_ap.sum())
    assert mass_ap >= 0.95 * mass_ex


def test_pallas_topk_matches_lax_topk(rng):
    """ops/pallas_topk.py == lax.top_k (+ cell gather), incl. tie-breaking
    and non-ROWS-aligned HW (interpret mode on CPU)."""
    from sgv3d_tpu.ops.pallas_topk import pallas_topk_with_cells
    from sgv3d_tpu.ops.voxel_pooling import topk_lift_inputs_hwd
    n, hw, d, k = 2, 700, 90, 16
    h = jnp.asarray(rng.normal(size=(n, hw, d)), jnp.float32)
    c = jnp.asarray(rng.integers(0, 16384, size=(n, hw, d)), jnp.int32)
    v1, c1 = pallas_topk_with_cells(h, c, k, True)
    v2, c2 = topk_lift_inputs_hwd(h, c, k, "exact")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # heavy ties: quantized values exercise the lowest-index tie-break
    h2 = jnp.asarray(rng.integers(0, 5, size=(n, hw, d)) / 4.0, jnp.float32)
    v1, c1 = pallas_topk_with_cells(h2, c, k, True)
    v2, c2 = topk_lift_inputs_hwd(h2, c, k, "exact")
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
