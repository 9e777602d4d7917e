"""Fused identity-bottleneck Pallas kernel vs the flax Bottleneck oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgv3d_tpu.nn.resnet import Bottleneck
from sgv3d_tpu.ops.pallas_bottleneck import (
    _pick_tile_h, fold_bottleneck_params, fused_bottleneck_stack)


def _make_block(rng, planes, c):
    """A Bottleneck with non-trivial BN stats so folding is actually tested."""
    block = Bottleneck(planes, 1, dtype=jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x0, False)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape) * 0.1, a.dtype),
        variables["params"])
    # Large positive BN biases make the folded conv bias strongly positive,
    # so any kernel that leaks relu(b1) through the conv2 zero-padding (the
    # image-edge halo rows) fails loudly instead of within tolerance.
    params = dict(params)
    for name in ("bn1", "bn2", "bn3"):
        params[name] = dict(params[name])
        params[name]["bias"] = jnp.asarray(
            np.abs(rng.standard_normal(params[name]["bias"].shape)) + 0.5,
            jnp.float32)
    stats = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.standard_normal(a.shape)) * 0.5
                              + 0.2, a.dtype),
        variables["batch_stats"])
    return block, {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("h,w", [(12, 16), (9, 8)])
def test_fused_block_matches_flax(h, w):
    rng = np.random.default_rng(0)
    planes, c = 8, 32
    block, variables = _make_block(rng, planes, c)
    x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)

    want = np.asarray(
        block.apply(variables, x.astype(jnp.bfloat16), False),
        np.float32)
    fw = fold_bottleneck_params(variables["params"],
                                variables["batch_stats"])
    got = np.asarray(
        fused_bottleneck_stack(x, [fw], interpret=True), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_fused_stack_chains_blocks():
    rng = np.random.default_rng(1)
    planes, c = 8, 32
    b1, v1 = _make_block(rng, planes, c)
    b2, v2 = _make_block(rng, planes, c)
    x = jnp.asarray(rng.standard_normal((1, 12, 8, c)), jnp.float32)

    want = b1.apply(v1, x.astype(jnp.bfloat16), False)
    want = np.asarray(b2.apply(v2, want, False), np.float32)
    blocks = [fold_bottleneck_params(v["params"], v["batch_stats"])
              for v in (v1, v2)]
    got = np.asarray(
        fused_bottleneck_stack(x, blocks, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=8e-2, rtol=8e-2)


def test_pick_tile_h():
    assert _pick_tile_h(216) == 18
    assert _pick_tile_h(108) == 18
    assert _pick_tile_h(54) == 18
    assert _pick_tile_h(27) == 9
    assert _pick_tile_h(7) == 7
    assert _pick_tile_h(13) == 13  # prime <= 18: single tile


def test_resnet_fused_matches_unfused():
    """ResNet(fused=True) must reproduce the unfused bf16 forward (same
    param tree; fused path reads conv/bn params and folds BN itself)."""
    from sgv3d_tpu.nn.resnet import ResNet

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    kwargs = dict(depth=50, base_channels=8, dtype=jnp.bfloat16)
    net = ResNet(**kwargs)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, False)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: jnp.asarray(
                np.abs(rng.standard_normal(a.shape)) * 0.5 + 0.2, a.dtype),
            variables["batch_stats"]),
    }
    want = net.apply(variables, x, False)
    got = ResNet(fused=True, **kwargs).apply(variables, x, False)
    assert len(want) == len(got) == 4
    for w, g in zip(want, got):
        assert g.shape == w.shape and g.dtype == w.dtype
        np.testing.assert_allclose(np.asarray(g, np.float32),
                                   np.asarray(w, np.float32),
                                   atol=1e-1, rtol=1e-1)


@pytest.mark.parametrize("h", [6, 36])  # single tile; multi-tile (th=18)
def test_conv2_zero_padding_at_image_edges(h):
    """conv2's padding must be zero in y1-space: with w1=0, b1=1, w2=w3=1
    the tap count is directly readable from the output (interior 9 taps,
    edge rows/cols 6, corners 4) — catches any kernel that leaks relu(b1)
    through the halo rows, exactly, not within tolerance."""
    from sgv3d_tpu.ops.pallas_bottleneck import fused_bottleneck_stack

    p, c, w = 8, 32, 8
    fw = {
        "w1": jnp.zeros((c, p), jnp.bfloat16),
        "b1": jnp.ones((1, p), jnp.float32),
        "w2": jnp.ones((9, p, p), jnp.bfloat16),
        "b2": jnp.zeros((1, p), jnp.float32),
        "w3": jnp.ones((p, c), jnp.bfloat16),
        "b3": jnp.zeros((1, c), jnp.float32),
    }
    x = jnp.zeros((1, h, w, c), jnp.float32)
    out = np.asarray(fused_bottleneck_stack(x, [fw], interpret=True),
                     np.float32)
    taps = np.full((h, w), 9.0)
    taps[[0, -1], :] = 6.0
    taps[:, [0, -1]] = 6.0
    taps[np.ix_([0, -1], [0, -1])] = 4.0
    np.testing.assert_array_equal(out[0, :, :, 0], taps * p * p)
    np.testing.assert_array_equal(
        out[0], np.broadcast_to(out[0, :, :, :1], out[0].shape))
