"""Distributed helper surface (single-process semantics)."""
from sgv3d_tpu import dist


def test_single_process_surface():
    assert dist.get_rank() == 0
    assert dist.get_world_size() == 1
    dist.synchronize()  # no-op, must not raise
    obj = {"a": [1, 2, 3], "b": "x"}
    gathered = dist.all_gather_object(obj)
    assert gathered == [obj]


def test_interleave_shards_roundrobin_and_truncation():
    """Per-rank shards [a0, a1], [b0, b1] interleave to [a0, b0, a1, b1] and
    distributed-sampler padding is cut at the dataset length."""
    gathered = [["r0_0", "r0_1", "r0_2"],
                ["r1_0", "r1_1", "r1_2"]]  # r1_2 is sampler padding
    out = dist.interleave_shards(gathered, total=5)
    assert out == ["r0_0", "r1_0", "r0_1", "r1_1", "r0_2"]


def test_interleave_shards_rejects_ragged_allows_capped(pytestconfig):
    """Shard-length skew (a rank mis-counting batches) must fail loudly, not
    silently drop the longer shards' tails and mis-pair frames with
    detections (ADVICE r4). A gather SHORTER than the dataset is legitimate
    — `evaluate(..., max_batches=N)` covers a prefix on every rank alike
    (code review r5) — and returns the prefix unchanged."""
    import pytest

    with pytest.raises(ValueError, match="ragged eval shards"):
        dist.interleave_shards([["a0", "a1"], ["b0"]], total=3)
    assert dist.interleave_shards([["a0"], ["b0"]], total=5) == ["a0", "b0"]


def test_all_gather_object_multihost_pad_exchange(monkeypatch):
    """Exercise the pickle/pad/allgather logic with a mocked 3-process
    multihost backend carrying payloads of different sizes."""
    import pickle

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    objs = [{"rank": 0, "data": list(range(50))},
            "short", {"rank": 2, "nested": {"x": np.arange(3).tolist()}}]
    payloads = [np.frombuffer(pickle.dumps(o), np.uint8) for o in objs]
    lengths = np.array([[p.size] for p in payloads], np.int32)
    max_len = int(lengths.max())

    me = 1  # pretend to be rank 1

    def fake_allgather(arr, **kw):
        arr = np.asarray(arr)
        if arr.dtype == np.int32 and arr.size == 1:
            # length exchange: our value must match what we'd contribute
            assert int(arr[0]) == payloads[me].size
            return lengths
        assert arr.dtype == np.uint8 and arr.size == max_len
        stacked = np.zeros((3, max_len), np.uint8)
        for i, p in enumerate(payloads):
            stacked[i, :p.size] = p
        # our padded row must round-trip to our object
        assert bytes(arr[:payloads[me].size]) == payloads[me].tobytes()
        return stacked

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)
    out = dist.all_gather_object(objs[me])
    assert out == objs
