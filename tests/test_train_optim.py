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
