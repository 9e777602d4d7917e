"""Determinism: identical seeds/state produce bit-identical results — a
feature the reference lacks (its CUDA atomicAdd float order is run-dependent,
/root/reference/ops/voxel_pooling/src/voxel_pooling_forward_cuda.cu:31)."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.data.synthetic import make_batch
from sgv3d_tpu.models.bev_height import BEVHeight
from sgv3d_tpu.ops.voxel_pooling import lift_splat_pool
from sgv3d_tpu.train import create_train_state, make_optimizer, make_train_step
from tests.tiny_configs import tiny_exp


def test_lift_splat_bitwise_deterministic(rng):
    n, d, hw, c, cells = 2, 6, 128, 8, 32
    height = jnp.asarray(rng.random((n, d, hw)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(n, hw, c)), jnp.float32)
    cell = jnp.asarray(rng.integers(0, cells + 1, (n, d, hw)), jnp.int32)
    f = jax.jit(lift_splat_pool, static_argnums=(3, 4, 5))
    a = np.asarray(f(height, ctx, cell, n, cells, 3))
    b = np.asarray(f(height, ctx, cell, n, cells, 3))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow  # 171 s on the 1-core host
def test_train_step_bitwise_deterministic():
    cfg = tiny_exp(is_bsm=False)
    imgs, mats, gt_boxes, gt_labels, _ = make_batch(cfg, batch=2, num_objs=3)
    model = BEVHeight(cfg)
    tx, _ = make_optimizer(cfg, 1, 10)
    args = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels), None)

    def run():
        state = create_train_state(
            model, cfg, tx,
            (imgs[:1], {k: v[:1] for k, v in mats.items()}), seed=0)
        step = make_train_step(model, cfg, tx, mesh=None, donate=False)
        losses = []
        for _ in range(2):
            state, metrics = step(state, *args)
            losses.append(float(jax.device_get(metrics["total_loss"])))
        return losses, state.params

    l1, p1 = run()
    l2, p2 = run()
    assert l1 == l2  # bitwise-identical losses
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
