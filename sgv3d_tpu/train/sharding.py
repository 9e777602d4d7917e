"""Device mesh + sharding layout.

The reference's only training parallelism is DDP (SURVEY §2.9); the TPU-native
equivalent is a 1-D `data` mesh with the batch dimension sharded over it and
parameters replicated. XLA inserts the gradient psum automatically when the
loss is computed from a sharded batch. For very large BEV grids (e.g. the
1408^2 Rope3D variant) `bev_shard_rule` additionally shards the BEV spatial
dim, riding ICI instead of spilling HBM.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              bev_parallel: int = 1) -> Mesh:
    """1-D data mesh, or a 2-D (data, bev) mesh when `bev_parallel` > 1.

    The `bev` axis spatially shards the BEV map (and thus every BEV-head
    conv, with XLA-inserted halo exchanges) — hybrid DP x SP for the big
    1408^2 grids. Pair with `bev_sharding(mesh)` on the model.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if bev_parallel > 1:
        assert len(devices) % bev_parallel == 0
        return Mesh(np.asarray(devices).reshape(-1, bev_parallel),
                    (axis_name, "bev"))
    return Mesh(np.asarray(devices), (axis_name,))


def bev_sharding(mesh: Mesh) -> NamedSharding | None:
    """Sharding spec for (B, Y, X, C) BEV maps on a hybrid (data, bev) mesh:
    Y is sharded over `bev` and the batch dim is left UNCONSTRAINED so it
    keeps whatever sharding flows in (sharded over `data` inside the train
    step; replicated for the batch-1 trace in `create_train_state`). Returns
    None on a mesh without a `bev` axis. (An earlier P(None, 'bev') spec
    replicated the batch dim, which made XLA all-gather the full batch onto
    every device and run the BEV head redundantly; a hard P('data', 'bev')
    breaks model.init, whose batch of 1 is not divisible by the data axis.)"""
    if "bev" not in mesh.axis_names:
        return None
    return NamedSharding(mesh, P(P.UNCONSTRAINED, "bev"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Mapping[str, Any] | tuple,
                axis_name: str = "data"):
    """Device-put a pytree of host arrays with the leading dim sharded."""
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
