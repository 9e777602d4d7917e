"""Optimizer schedule + CBGS + loader unit tests."""
import numpy as np
import pytest

from sgv3d_tpu.train.optim import make_optimizer, multistep_schedule
from tests.tiny_configs import tiny_exp


def test_multistep_schedule_decays_at_milestones():
    sched = multistep_schedule(1e-3, [100, 200])
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(99)) == pytest.approx(1e-3)
    assert float(sched(150)) == pytest.approx(1e-4)
    assert float(sched(250)) == pytest.approx(1e-5)


def test_lr_scales_with_global_batch():
    cfg = tiny_exp()
    _, sched1 = make_optimizer(cfg, num_devices=1, steps_per_epoch=10)
    _, sched8 = make_optimizer(cfg, num_devices=8, steps_per_epoch=10)
    assert float(sched8(0)) == pytest.approx(8 * float(sched1(0)))
    # milestones are epochs x steps_per_epoch
    assert float(sched1(cfg.lr_milestones[0] * 10 + 1)) == pytest.approx(
        0.1 * float(sched1(0)))


def test_schedule_value_matches_optax():
    """The host-side pure-python LR (runner's per-step metrics log — the
    optax schedule would run eager device ops per step, CLAUDE.md landmine
    6) must track the optax schedule exactly, boundaries included."""
    from sgv3d_tpu.train.optim import schedule_value

    cfg = tiny_exp()
    spe = 7
    for n_dev in (1, 8):
        _, sched = make_optimizer(cfg, num_devices=n_dev, steps_per_epoch=spe)
        probes = [0, 1]
        for m in cfg.lr_milestones:
            probes += [m * spe - 1, m * spe, m * spe + 1]
        probes.append(cfg.lr_milestones[-1] * spe + 100)
        for step in probes:
            assert float(sched(step)) == pytest.approx(
                schedule_value(cfg, n_dev, spe, step), rel=1e-6), step


def test_cbgs_resampling(tmp_path):
    import pickle
    from sgv3d_tpu.data.dataset import RoadSideDataset
    # 3 frames: two all-car, one pedestrian-heavy -> CBGS oversamples peds
    def ann(cat):
        return dict(category_name=cat, translation=[10, 0, 0.5],
                    size=[1, 1, 1], rotation=[1, 0, 0, 0],
                    velocity=[0, 0, 0], num_lidar_pts=3, num_radar_pts=0)
    infos = []
    for i, cats in enumerate([["vehicle.car"] * 3,
                              ["vehicle.car"] * 3,
                              ["human.pedestrian.adult"]]):
        infos.append(dict(
            sample_token=str(i), scene_token="s",
            cam_infos={"CAM_FRONT": dict(
                filename="x.jpg",
                calibrated_sensor=dict(rotation_matrix=np.eye(3).tolist(),
                                       translation=[0, 0, 5],
                                       camera_intrinsic=np.eye(3).tolist()),
                ego_pose=dict(rotation=[1, 0, 0, 0], translation=[0, 0, 0]),
                timestamp=0)},
            sweeps=[], ann_infos=[ann(c) for c in cats]))
    path = tmp_path / "infos.pkl"
    with open(path, "wb") as f:
        pickle.dump(infos, f)
    ds = RoadSideDataset(
        {"final_dim": (32, 64), "H": 64, "W": 128, "bot_pct_lim": (0.0, 0.0),
         "cams": ["CAM_FRONT"], "Ncams": 1},
        ("car", "pedestrian"), str(tmp_path), str(path), is_train=True,
        use_cbgs=True, max_objs=8)
    idxs = np.asarray(ds.sample_indices)
    # pedestrian frame (index 2) is oversampled relative to its share
    ped_frac = (idxs == 2).mean()
    assert ped_frac > 1 / 3


def test_tb_writer_events_parse(tmp_path):
    """Our dependency-free TensorBoard writer emits records that the
    standard Event proto parses back (tags, values, steps, CRC framing)."""
    import struct

    from sgv3d_tpu.train.tb_writer import ScalarWriter, _masked_crc

    w = ScalarWriter(str(tmp_path))
    w.add_scalars(1, {"total_loss": 0.5, "lr": 1e-4})
    w.add_scalars(2, {"total_loss": 0.25})
    w.close()

    data = open(w.path, "rb").read()
    events = []
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert len_crc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert crc == _masked_crc(payload)
        events.append(payload)
        off += 16 + length
    assert len(events) == 3  # file_version + 2 scalar events

    try:  # cross-check with the real proto if available (pure protobuf)
        from tensorboardX.proto import event_pb2
    except Exception:
        return
    ev0 = event_pb2.Event.FromString(events[0])
    assert ev0.file_version == "brain.Event:2"
    ev1 = event_pb2.Event.FromString(events[1])
    assert ev1.step == 1
    vals = {v.tag: v.simple_value for v in ev1.summary.value}
    assert abs(vals["total_loss"] - 0.5) < 1e-6
    assert abs(vals["lr"] - 1e-4) < 1e-9
    ev2 = event_pb2.Event.FromString(events[2])
    assert ev2.step == 2 and ev2.summary.value[0].simple_value == 0.25


def test_metrics_logger_deferred_flush(tmp_path):
    """The logger defers each step's device fetch/write by one log() call
    (so it overlaps the next step's compute) but close() flushes the tail:
    every step must land in the JSONL, in order, with its own values."""
    import json

    import jax.numpy as jnp

    from sgv3d_tpu.train.metrics import MetricsLogger

    path = str(tmp_path / "metrics.jsonl")
    logger = MetricsLogger(path, print_every=0)
    for s in range(1, 4):
        logger.log(s, {"total_loss": jnp.asarray(float(s))}, lr=s * 0.1)
        # step s-1 (not s) is on disk after log(s)
        lines = open(path).read().splitlines()
        assert len(lines) == s - 1
    logger.close()
    records = [json.loads(l) for l in open(path)]
    assert [r["step"] for r in records] == [1, 2, 3]
    assert [r["total_loss"] for r in records] == [1.0, 2.0, 3.0]
    assert abs(records[2]["lr"] - 0.3) < 1e-9


def test_pipelined_order_and_tail():
    """utils.pipeline.pipelined: one dispatch ahead, in-order results, tail
    flushed, and dispatch(i+1) happens BEFORE collect(i) (the overlap that
    is the helper's whole point)."""
    from sgv3d_tpu.utils.pipeline import pipelined

    events = []

    def dispatch(x):
        events.append(("d", x))
        return x * 10

    def collect(p):
        events.append(("c", p))
        return p + 1

    assert list(pipelined([], dispatch, collect)) == []
    assert list(pipelined([7], dispatch, collect)) == [71]
    events.clear()
    assert list(pipelined([1, 2, 3], dispatch, collect)) == [11, 21, 31]
    assert events == [("d", 1), ("d", 2), ("c", 10), ("d", 3), ("c", 20),
                      ("c", 30)]
