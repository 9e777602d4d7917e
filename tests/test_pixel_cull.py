"""Static-rig pixel culling of the serving lift (VERDICT r5 perf line).

`ops.voxel_pooling.cull_static_cells` statically drops pixels whose entire
height-bin ray is out of the BEV grid; the predictor applies it on top of
the per-rig cell cache. The invariant under test: culling is BIT-IDENTICAL
to the full lift (row order is preserved, so the scatter's per-cell
accumulation order is unchanged).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.data.synthetic import make_batch
from sgv3d_tpu.ops.voxel_pooling import cull_static_cells
from tests.tiny_configs import tiny_exp


def test_cull_static_cells_contract():
    rng = np.random.default_rng(0)
    bn, hw, d, num_cells = 2, 1000, 4, 64
    cells = rng.integers(0, num_cells + 1, size=(bn, hw, d)).astype(np.int32)
    # make 300 pixels fully-trash in EVERY camera (the union rule)
    trash_pix = rng.choice(hw, size=300, replace=False)
    cells[:, trash_pix, :] = num_cells
    out = cull_static_cells(cells, num_cells, bucket=128)
    assert out is not None
    culled, pix_keep = out
    n_valid = hw - len(trash_pix)
    assert len(pix_keep) % 128 == 0 and len(pix_keep) >= n_valid
    assert culled.shape == (bn, len(pix_keep), d)
    # kept indices are sorted (row order preserved => bit-identical scatter)
    assert np.all(np.diff(pix_keep[:n_valid]) > 0)
    assert not np.isin(pix_keep[:n_valid], trash_pix).any()
    # padded rows are all-trash
    assert np.all(culled[:, n_valid:, :] == num_cells)
    # kept rows transcribe the original cells
    assert np.array_equal(culled[:, :n_valid], cells[:, pix_keep[:n_valid]])
    # a rig with (almost) no trash pixels declines to cull
    dense = rng.integers(0, num_cells, size=(bn, hw, d)).astype(np.int32)
    assert cull_static_cells(dense, num_cells) is None


def test_predictor_cull_pixels_bit_identical():
    """End-to-end through BEVHeightPredictor: culled serving output equals
    the unculled one bitwise, and the culled cell cache is actually smaller."""
    from sgv3d_tpu.api import BEVHeightPredictor
    from sgv3d_tpu.models.bev_height import BEVHeight

    cfg = tiny_exp(False)
    # top-k lift (the serving mode culling applies to) + a shrunken BEV
    # range so a solid band of pixels is fully out of grid on the tiny rig
    cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, lift_top_k=4,
        x_bound=(0.0, 12.8, 1.6), y_bound=(-6.4, 6.4, 1.6)))
    imgs, mats, *_ = make_batch(cfg, batch=2, num_objs=4)
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)

    plain = BEVHeightPredictor(cfg, variables, use_bf16=False,
                               cull_pixels=False)
    culled = BEVHeightPredictor(cfg, variables, use_bf16=False,
                                cull_pixels=True)
    out_p = plain(imgs, mats)
    out_c = culled(imgs, mats)

    cells_c, pix = culled._cells
    assert pix is not None, "tiny rig produced no cullable pixels"
    hw = cfg.backbone.feat_hw[0] * cfg.backbone.feat_hw[1]
    assert cells_c.shape[1] < hw  # the lift really runs on fewer pixels
    assert plain._cells[1] is None

    for (bp, sp, lp), (bc, sc, lc) in zip(out_p, out_c):
        np.testing.assert_array_equal(bp, bc)
        np.testing.assert_array_equal(sp, sc)
        np.testing.assert_array_equal(lp, lc)


def test_predictor_cull_pixels_validation():
    """An explicit cull_pixels=True the path cannot honour fails loudly
    instead of silently mis-gathering or being ignored (code review r5)."""
    import pytest

    from sgv3d_tpu.api import BEVHeightPredictor

    cfg = tiny_exp(False)  # lift_top_k is None -> exact lift, no culling
    with pytest.raises(ValueError, match="top-k"):
        BEVHeightPredictor(cfg, {}, use_bf16=False, cull_pixels=True)
    cfg_k = dataclasses.replace(cfg, backbone=dataclasses.replace(
        cfg.backbone, lift_top_k=4))
    with pytest.raises(ValueError, match="static_rig"):
        BEVHeightPredictor(cfg_k, {}, use_bf16=False, static_rig=False,
                           cull_pixels=True)
