"""BEV spatial sharding: the head over a spatially-sharded BEV map (for the
1408^2 Rope3D variant, SURVEY §5 'long context' note) — XLA inserts the conv
halo exchanges automatically; output must match the unsharded run."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgv3d_tpu.heads.bev_head import BEVHeightHead
from tests.tiny_configs import tiny_head


def test_head_on_spatially_sharded_bev(rng):
    cfg = tiny_head()
    head = BEVHeightHead(cfg)
    bev = jnp.asarray(rng.normal(size=(1, 64, 64, 16)), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), bev, False)

    ref = head.apply(variables, bev, False)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("y",))
    bev_sharded = jax.device_put(bev, NamedSharding(mesh, P(None, "y")))
    f = jax.jit(lambda v, b: head.apply(v, b, False),
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P(None, "y"))),
                out_shardings=NamedSharding(mesh, P()))
    out = f(variables, bev_sharded)

    for t in range(len(ref)):
        for k in ref[t]:
            np.testing.assert_allclose(
                np.asarray(out[t][k]), np.asarray(ref[t][k]),
                rtol=1e-4, atol=1e-4)


@pytest.mark.slow  # 223 s on the 1-core host
def test_hybrid_dp_sp_train_step_matches_dp(rng):
    """One train step on a hybrid (data=2, bev=2) mesh — batch sharded over
    `data`, BEV map spatially sharded over `bev` (halo exchanges in the head
    convs) — produces the same loss as the plain DP mesh."""
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight
    from sgv3d_tpu.train import (create_train_state, make_mesh,
                                 make_optimizer, make_train_step, shard_batch)
    from sgv3d_tpu.train.sharding import bev_sharding
    from tests.tiny_configs import tiny_exp

    cfg = tiny_exp(True)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=4, num_objs=3, seed=1)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=10)

    def one_step(mesh, model):
        state = create_train_state(model, cfg, tx, (imgs[:1], mats))
        step = make_train_step(model, cfg, tx, mesh=mesh, donate=False)
        batch = shard_batch(mesh, (
            jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
            jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_semantic)))
        _, metrics = step(state, *batch)
        return float(jax.device_get(metrics["total_loss"]))

    mesh_dp = make_mesh(4)
    loss_dp = one_step(mesh_dp, BEVHeight(cfg))
    mesh_sp = make_mesh(4, bev_parallel=2)
    loss_sp = one_step(mesh_sp, BEVHeight(cfg,
                                          bev_sharding=bev_sharding(mesh_sp)))
    assert np.isfinite(loss_dp) and np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=1e-4)
