"""Host data pipeline vs the independent reference transcription
(tests/data_oracle.py) — same-draw tensor equality, the data-side
counterpart of torch_oracle.py (VERDICT r3 next-step #2).

Covers: the eval chain (ida resize/crop, imnormalize channel reversal,
calibration matrices, denorm-derived sensor2virtual/reference_height), the
50% rectify aug (shrink & grow branches, image + matrices), the 30%
brightness aug (cv2 fixed-point gray + convertScaleAbs reflect-round), the
semantic mask /40 path under the full warp chain, get_gt (category filter,
zero-point filter, wlh reorder, composed-quaternion yaw wrap), and
bev_transform (rotate/scale/flips).
"""
import os
import pickle
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(__file__))

import data_oracle as O  # noqa: E402

from sgv3d_tpu import geom  # noqa: E402
from sgv3d_tpu.data.dataset import RoadSideDataset  # noqa: E402

CLASSES = ("car", "pedestrian", "bicycle")
IDA = dict(final_dim=(64, 96), H=160, W=240, bot_pct_lim=(0.0, 0.0),
           cams=["CAM_FRONT"], Ncams=1)


class FakeRng:
    """Stands in for np.random.Generator; pops prescribed draws so the
    dataset and the oracle consume identical randomness."""

    def __init__(self, randoms=(), normals=()):
        self.randoms = list(randoms)
        self.normals = list(normals)

    def random(self):
        return self.randoms.pop(0)

    def normal(self, loc=0.0, scale=1.0):
        return self.normals.pop(0)


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


def _write_tree(tmp_path, n_frames=2):
    root = str(tmp_path / "data")
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "training/mask_image"))
    rng = np.random.default_rng(0)

    # roadside-style calibration: camera 6 m up, pitched down
    pitch = 0.18
    cam2ego = (np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
               @ geom.rodrigues(np.array([pitch, 0, 0])).T)
    K = [[350.0, 0.0, 120.0], [0.0, 350.0, 80.0], [0.0, 0.0, 1.0]]
    ego_q = _yaw_quat(0.3)  # non-identity yaw-only ego pose
    infos = []
    for i in range(n_frames):
        img = rng.integers(0, 256, (160, 240, 3), np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "images", f"{i:06d}.png"))
        mask = (rng.integers(0, 4, (160, 240, 3)) * 40).astype(np.uint8)
        np.save(os.path.join(root, "training/mask_image", f"{i:06d}.npy"),
                mask)
        anns = [
            # kept: composed yaw -3.1 - 0.3 wraps past -pi
            dict(category_name="vehicle.car", translation=[12.0, -3.0, 0.8],
                 size=[1.9, 4.5, 1.6], rotation=_yaw_quat(-3.1),
                 velocity=[1.0, -0.5, 0.0], num_lidar_pts=5,
                 num_radar_pts=0),
            dict(category_name="human.pedestrian.adult",
                 translation=[8.0, 2.0, 0.9], size=[0.6, 0.8, 1.7],
                 rotation=_yaw_quat(1.2), velocity=[0.0, 0.0, 0.0],
                 num_lidar_pts=3, num_radar_pts=1),
            dict(category_name="vehicle.bicycle",
                 translation=[15.0, 4.0, 0.7], size=[0.6, 1.8, 1.2],
                 rotation=_yaw_quat(2.9), velocity=[-0.3, 0.2, 0.0],
                 num_lidar_pts=2, num_radar_pts=0),
            # filtered: zero lidar+radar points
            dict(category_name="vehicle.car", translation=[20.0, 0.0, 0.8],
                 size=[1.9, 4.5, 1.6], rotation=_yaw_quat(0.5),
                 velocity=[0.0, 0.0, 0.0], num_lidar_pts=0,
                 num_radar_pts=0),
            # filtered: class not in CLASSES
            dict(category_name="vehicle.truck", translation=[25.0, 5.0, 1.2],
                 size=[2.5, 8.0, 3.0], rotation=_yaw_quat(0.0),
                 velocity=[0.0, 0.0, 0.0], num_lidar_pts=9,
                 num_radar_pts=0),
        ]
        infos.append(dict(
            sample_token=f"{i:06d}", scene_token="s0",
            cam_infos={"CAM_FRONT": dict(
                filename=f"images/{i:06d}.png",
                calibrated_sensor=dict(
                    rotation_matrix=cam2ego.tolist(),
                    translation=[0.5, -0.2, 6.0],
                    camera_intrinsic=K),
                ego_pose=dict(rotation=ego_q, translation=[1.0, 2.0, 0.0]),
                timestamp=0)},
            sweeps=[], ann_infos=anns))
    info_path = os.path.join(root, "infos.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    return root, info_path, infos


def _assert_image_chain(sample, oracle):
    np.testing.assert_array_equal(sample["imgs"][0, 0], oracle["img"])
    np.testing.assert_allclose(sample["sensor2ego_mats"][0, 0],
                               oracle["sensor2ego"], atol=2e-5)
    np.testing.assert_allclose(sample["intrin_mats"][0, 0],
                               oracle["intrin"], atol=1e-4, rtol=1e-6)
    np.testing.assert_allclose(sample["ida_mats"][0, 0], oracle["ida"],
                               atol=1e-6)
    np.testing.assert_allclose(sample["sensor2virtual_mats"][0, 0],
                               oracle["sensor2virtual"], atol=2e-5)
    np.testing.assert_allclose(sample["reference_heights"][0, 0],
                               oracle["reference_height"], atol=1e-5)


def test_eval_chain_matches_oracle(tmp_path):
    """No-aug (val) chain: images bitwise, matrices to float32 noise."""
    root, info_path, infos = _write_tree(tmp_path)
    ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=False,
                         max_objs=8)
    for i in range(2):
        sample = ds[i]
        oracle = O.oracle_get_image(infos[i]["cam_infos"]["CAM_FRONT"],
                                    root, IDA)
        _assert_image_chain(sample, oracle)


def test_rectify_chain_matches_oracle(tmp_path):
    """50% intrinsic/extrinsic rectify aug, both ratio branches: the warped
    image is bitwise-equal and the rectified intrinsics/extrinsics match."""
    root, info_path, infos = _write_tree(tmp_path)
    for draws in ((0.83, 1.7, -0.4),    # ratio<=1: paste branch
                  (1.21, -2.3, 0.55)):  # ratio>1: crop branch
        ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=True,
                             max_objs=8)
        # rectify gate ON (0.1<0.5), brightness gate OFF (0.9>=0.3)
        ds.rng = FakeRng(randoms=[0.1, 0.9], normals=list(draws))
        sample = ds[0]
        oracle = O.oracle_get_image(infos[0]["cam_infos"]["CAM_FRONT"],
                                    root, IDA, rectify_draws=draws)
        _assert_image_chain(sample, oracle)


def test_brightness_matches_oracle(tmp_path):
    """30% brightness aug: cv2 fixed-point gray (BGR weights on the RGB
    array) and convertScaleAbs reflect-round semantics, bitwise."""
    root, info_path, infos = _write_tree(tmp_path)
    for u in (0.9, 0.05):
        ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=True,
                             max_objs=8)
        # rectify OFF (0.7>=0.5), brightness ON (0.1<0.3) with draw u
        ds.rng = FakeRng(randoms=[0.7, 0.1, u])
        sample = ds[0]
        oracle = O.oracle_get_image(infos[0]["cam_infos"]["CAM_FRONT"],
                                    root, IDA, brightness_u=u)
        np.testing.assert_array_equal(sample["imgs"][0, 0], oracle["img"])


def test_semantic_chain_matches_oracle(tmp_path):
    """Semantic mask /40 path under the full warp chain (rectify + ida)."""
    root, info_path, infos = _write_tree(tmp_path)
    draws = (0.9, 1.1, 0.3)
    ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=True,
                         max_objs=8, return_semantic=True)
    ds.rng = FakeRng(randoms=[0.1, 0.9], normals=list(draws))
    sample = ds[0]
    oracle = O.oracle_get_image(infos[0]["cam_infos"]["CAM_FRONT"], root,
                                IDA, rectify_draws=draws,
                                return_semantic=True)
    np.testing.assert_array_equal(sample["gt_semantic"][0],
                                  oracle["gt_semantic"])
    assert oracle["gt_semantic"].max() <= 3  # /40 landed in class-id space


def test_gt_matches_oracle(tmp_path):
    """get_gt: category + zero-point filters, wlh->(l,w,h) reorder, ego
    translation/rotation, composed-quaternion yaw (wraps into (-pi, pi]),
    rotated velocity; padding beyond n stays empty."""
    root, info_path, infos = _write_tree(tmp_path)
    ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=True,
                         max_objs=8)
    ds.rng = FakeRng(randoms=[0.9, 0.9])  # all image augs off
    sample = ds[0]

    oboxes, olabels = O.oracle_get_gt(infos[0], CLASSES)
    n = len(olabels)
    assert n == 3  # two of five anns filtered
    np.testing.assert_array_equal(sample["gt_labels"][:n], olabels)
    assert (sample["gt_labels"][n:] == -1).all()
    np.testing.assert_allclose(sample["gt_boxes"][:n], oboxes,
                               atol=1e-5, rtol=1e-5)
    assert (sample["gt_boxes"][n:] == 0).all()
    # the wrap case actually exercised the branch
    assert (np.abs(oboxes[:, 6]) <= np.pi).all()
    assert oboxes[0, 6] > 2.8  # -3.4 wrapped to ~+2.88


def test_gt_velocity_rotates_full_3vector(tmp_path):
    """nuscenes Box.rotate spins the FULL velocity 3-vector before [:2] is
    taken (reference get_gt :697-707 -> Box.rotate): with pitch in the ego
    pose, vz leaks into vx/vy. Both the pipeline and the oracle must carry
    that term. (The reference's info generators always write
    velocity=zeros(3) — gen_info_*.py:191/208/232 — so this is a
    transcription-exactness case, not a real-data one.)"""
    import math

    root, info_path, infos = _write_tree(tmp_path)
    ds = RoadSideDataset(IDA, CLASSES, root, info_path, is_train=True,
                         max_objs=8)
    # ego pose with yaw 0.3 AND pitch 0.2; one kept car ann with vz != 0
    qz = _yaw_quat(0.3)
    qy = [math.cos(0.1), 0.0, math.sin(0.1), 0.0]
    q_ego = list(O.quat_mul(qz, qy))
    v3 = np.array([1.0, -0.5, 2.0])
    info = dict(infos[0])
    info["cam_infos"] = {"CAM_FRONT": dict(
        infos[0]["cam_infos"]["CAM_FRONT"],
        ego_pose=dict(rotation=q_ego, translation=[1.0, 2.0, 0.0]))}
    info["ann_infos"] = [dict(
        category_name="vehicle.car", translation=[12.0, -3.0, 0.8],
        size=[1.9, 4.5, 1.6], rotation=_yaw_quat(-1.0),
        velocity=v3.tolist(), num_lidar_pts=5, num_radar_pts=0)]

    # independent expectation: R = Rz(0.3) @ Ry(0.2) via axis-angle, then
    # the inverse rotation of the full 3-vector
    R = (geom.rodrigues(np.array([0.0, 0.0, 0.3]))
         @ geom.rodrigues(np.array([0.0, 0.2, 0.0])))
    want = (R.T @ v3)[:2]
    # the truncated 2x2 formula this test exists to rule out
    wrong = R.T[:2, :2] @ v3[:2]
    assert not np.allclose(want, wrong, atol=1e-6)

    boxes, labels = ds.get_gt(info)
    np.testing.assert_allclose(boxes[0, 7:9], want, atol=1e-5)
    oboxes, _ = O.oracle_get_gt(info, CLASSES)
    np.testing.assert_allclose(oboxes[0, 7:9], want, atol=1e-9)


def test_bev_transform_matches_oracle():
    rng = np.random.default_rng(4)
    boxes = rng.normal(0, 5, (6, 9)).astype(np.float32)
    for rot, scale, fdx, fdy in ((0.0, 1.0, False, False),
                                 (13.0, 1.1, False, False),
                                 (-7.0, 0.9, True, False),
                                 (21.0, 1.0, False, True),
                                 (5.0, 1.05, True, True)):
        got, got_rot = geom.bev_transform(boxes, rot, scale, fdx, fdy)
        want, want_rot = O.oracle_bev_transform(boxes, rot, scale, fdx, fdy)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(got_rot, want_rot, atol=1e-6)
