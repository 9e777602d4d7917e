"""Distributed helpers with the same 4-function surface as the reference's
utils/torch_dist.py:8-43 (rank / world size / barrier / object all-gather),
implemented over JAX multi-host primitives. On a single host these are cheap
no-ops, matching the reference's guards.
"""
from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def synchronize() -> None:
    """Cross-host barrier (no-op on a single process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("sgv3d_tpu_barrier")


def interleave_shards(gathered: List[List[Any]], total: int) -> List[Any]:
    """Undo round-robin sharding: interleave per-rank lists (rank 0 item 0,
    rank 1 item 0, ..., rank 0 item 1, ...) and truncate the padding a
    distributed sampler added to equalise shard lengths — the reference's
    eval gather (/root/reference/exps/sgv3d/...r50...py:372-380).

    Shard-length skew fails loudly: zip() would silently drop trailing items
    of the longer shards and mis-pair frames with detections, surfacing only
    as mysteriously low AP (ADVICE r4). Gathering FEWER than `total` items
    is legitimate (an eval capped by `max_batches` covers a dataset prefix)
    as long as every rank agrees on the shard length."""
    lengths = sorted({len(g) for g in gathered})
    if len(lengths) != 1:
        raise ValueError(
            f"ragged eval shards (lengths {[len(g) for g in gathered]}): "
            "a rank mis-counted its batches; the padded distributed sampler "
            "must give every rank the same shard length")
    result = sum(map(list, zip(*gathered)), [])
    return result[:total]


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process."""
    world = jax.process_count()
    if world == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # Pad to the max length across hosts, exchange lengths first.
    length = np.asarray([payload.size], np.int32)
    all_lengths = multihost_utils.process_allgather(length)
    max_len = int(np.max(all_lengths))
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(all_lengths[i, 0])].tobytes())
        for i in range(world)
    ]
