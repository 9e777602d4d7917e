"""Distributed helper surface (single-process semantics)."""
from sgv3d_tpu import dist


def test_single_process_surface():
    assert dist.get_rank() == 0
    assert dist.get_world_size() == 1
    dist.synchronize()  # no-op, must not raise
    obj = {"a": [1, 2, 3], "b": "x"}
    gathered = dist.all_gather_object(obj)
    assert gathered == [obj]
