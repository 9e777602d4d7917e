"""BEV spatial sharding: the head over a spatially-sharded BEV map (for the
1408^2 Rope3D variant, SURVEY §5 'long context' note) — XLA inserts the conv
halo exchanges automatically; output must match the unsharded run."""
import jax
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
