"""Pallas lift-splat kernel vs the XLA reference path (interpret mode on CPU)."""
import jax.experimental.pallas as pl
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sgv3d_tpu.ops.pallas_lift_splat as pls
from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pls.pl, "pallas_call", patched)


def _compare(n, d, hw, c, cells, cell_gen, rng, tol=6e-3):
    # tolerance is bf16-level: the kernel multiplies bf16 values (matching
    # the bf16 conv outputs feeding it) with fp32 accumulation
    height = jnp.asarray(rng.random((n, d, hw)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(n, hw, c)), jnp.float32)
    cell = jnp.asarray(cell_gen((n, d, hw)), jnp.int32)
    out = np.asarray(pls.pallas_lift_splat_forward(height, ctx, cell, n, cells))
    ref = np.asarray(lift_splat_pool(height, ctx, cell, n, cells, 5))
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(out, ref, atol=tol * scale)


def test_dense_keys(rng):
    _compare(2, 5, 512, 16, 64,
             lambda s: rng.integers(0, 65, size=s), rng)


def test_sparse_keys_multi_window(rng):
    # few points over many cells: chunks span multiple windows
    _compare(1, 4, 512, 16, 4096,
             lambda s: np.sort(rng.choice(4096, size=s)), rng)


def test_all_trash(rng):
    _compare(1, 2, 512, 8, 32, lambda s: np.full(s, 32), rng)


def test_skewed_single_cell(rng):
    # everything lands in one cell (degenerate hot cell)
    _compare(1, 3, 512, 8, 64, lambda s: np.zeros(s, np.int64), rng)


def test_multi_camera_batch(rng):
    n, d, hw, c, cells = 4, 3, 256, 8, 48
    height = jnp.asarray(rng.random((n, d, hw)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(n, hw, c)), jnp.float32)
    cell = jnp.asarray(rng.integers(0, cells + 1, size=(n, d, hw)), jnp.int32)
    # 2 batches x 2 cams: camera grids must sum per batch
    out = np.asarray(pls.pallas_lift_splat_forward(height, ctx, cell, 2, cells))
    ref = np.asarray(lift_splat_pool(height, ctx, cell, 2, cells, 3))
    np.testing.assert_allclose(out, ref, atol=6e-3 * max(1, np.abs(ref).max()))
