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

    Under a multi-process runtime (`jax.distributed.initialize`, one process
    per host of a pod slice) the mesh always spans ALL global devices —
    slicing to a prefix would strand the other processes' chips, and every
    process must participate in each collective anyway.
    """
    devices = jax.devices()
    if jax.process_count() > 1:
        assert n_devices in (None, len(devices)), (
            f"multi-process meshes span all {len(devices)} global devices; "
            f"got n_devices={n_devices}")
    elif n_devices is not None:
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
    """Device-put a pytree of host arrays with the leading dim sharded.

    Single-process: a plain `device_put` (XLA slices the host array onto the
    local shards). Multi-process: each process passes only its LOCAL slice of
    the global batch (its loader shard) and the slices are assembled into one
    global jax.Array via `make_array_from_process_local_data` — no
    host-side exchange; every chip receives only its own rows.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), batch)


def host_local_state_to_global(mesh: Mesh, tree):
    """Convert a process-local (replicated-by-construction) pytree — e.g. a
    TrainState every process built identically from the same seed — into
    globally-replicated jax.Arrays over `mesh`. No-op on a single process."""
    if jax.process_count() == 1:
        return tree
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves and all(isinstance(x, jax.Array)
                      and not x.is_fully_addressable for x in leaves):
        return tree  # already global (e.g. a state out of train())
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        tree, mesh, jax.tree_util.tree_map(lambda _: P(), tree))


def process_local_rows(x) -> np.ndarray:
    """Rows of a leading-axis-sharded global array owned by THIS process, in
    ascending global index — i.e. exactly the rows this process fed into
    `shard_batch`, in the same order. Fully-addressable arrays pass through."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    shards = [s for s in x.addressable_shards]
    shards.sort(key=lambda s: s.index[0].start or 0)
    seen = set()
    parts = []
    for s in shards:  # replicated-over-other-axes shards repeat rows; dedup
        key = (s.index[0].start, s.index[0].stop)
        if key in seen:
            continue
        seen.add(key)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts, axis=0)
