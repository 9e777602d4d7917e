"""Dataset converter tests with synthetic raw trees."""
import json
import os
import pickle
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from converters import dair, rope3d  # noqa: E402


def _fake_dair_root(tmp_path, n=3):
    root = tmp_path / "dair-v2x-i"
    for sub in ("image", "calib/camera_intrinsic",
                "calib/virtuallidar_to_camera", "label/camera"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = [f"{i:06d}" for i in range(n)]
    for sid in ids:
        Image.fromarray((rng.random((54, 96, 3)) * 255).astype(np.uint8)
                        ).save(root / "image" / f"{sid}.jpg")
        with open(root / "calib/camera_intrinsic" / f"{sid}.json", "w") as f:
            json.dump({"cam_K": [2000.0, 0, 960, 0, 2000.0, 540, 0, 0, 1],
                       "cam_D": [0, 0, 0, 0, 0]}, f)
        # camera 7 m above ground looking down the lidar x axis
        r = [[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]
        with open(root / "calib/virtuallidar_to_camera" / f"{sid}.json",
                  "w") as f:
            json.dump({"rotation": r, "translation": [[0.0], [7.0], [0.0]]}, f)
        labels = [{
            "type": "Truck", "truncated_state": 0, "occluded_state": 0,
            "alpha": 0.1,
            "2d_box": {"xmin": 100, "ymin": 200, "xmax": 300, "ymax": 400},
            "3d_dimensions": {"h": 1.5, "w": 1.9, "l": 4.5},
            "3d_location": {"x": 30.0, "y": 2.0, "z": 0.75},
            "rotation": 0.3,
        }, {
            "type": "Pedestrian", "truncated_state": 0, "occluded_state": 0,
            "alpha": 0.1,
            "2d_box": {"xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4},
            "3d_dimensions": {"h": 0.0, "w": 0.0, "l": 0.0},
            "3d_location": {"x": 10.0, "y": 0.0, "z": 1.0},
            "rotation": 0.0,
        }]
        with open(root / "label/camera" / f"{sid}.json", "w") as f:
            json.dump(labels, f)
    split = {"train": ids[:2], "val": ids[2:]}
    with open(tmp_path / "split.json", "w") as f:
        json.dump(split, f)
    return str(root), str(tmp_path / "split.json"), ids


def test_dair2kitti_conversion(tmp_path):
    root, split_path, ids = _fake_dair_root(tmp_path)
    target = str(tmp_path / "dair-v2x-i-kitti")
    dair.dair2kitti(root, target, split_path)
    label = open(os.path.join(target, "training/label_2/000000.txt")
                 ).read().strip().split("\n")
    # zero-size pedestrian filtered; Truck rewritten to Car
    assert len(label) == 1
    parts = label[0].split(" ")
    assert parts[0] == "Car"
    # reference column order h, l, w
    assert [float(parts[8]), float(parts[9]), float(parts[10])] == [1.5, 4.5, 1.9]
    # rotation negated lidar yaw
    assert float(parts[14]) == pytest.approx(-0.3)
    # location converted to camera frame: x=-y=-2, y=-z+7=6.25, z=x=30
    # (label z shifted to bottom: 0.75 - 1.5/2 = 0)
    np.testing.assert_allclose(
        [float(parts[11]), float(parts[12]), float(parts[13])],
        [-2.0, 7.0, 30.0], atol=1e-6)
    calib = open(os.path.join(target, "training/calib/000000.txt")).read()
    assert "P2: 2000.0" in calib and "Tr_velo_to_cam:" in calib
    sets = open(os.path.join(target, "ImageSets/train.txt")).read().split()
    assert sets == ids[:2]


def test_gen_info_dair_and_dataset_roundtrip(tmp_path):
    root, split_path, ids = _fake_dair_root(tmp_path)
    infos = dair.generate_info_dair(root, "train", split_path)
    assert len(infos) == 2
    info = infos[0]
    cam = info["cam_infos"]["CAM_FRONT"]
    assert cam["filename"].startswith("image/")
    # cam2lidar rotation: inverse of velo2cam
    r_c2l = np.asarray(cam["calibrated_sensor"]["rotation_matrix"])
    r_l2c = np.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
    np.testing.assert_allclose(r_c2l, np.linalg.inv(r_l2c), atol=1e-9)
    ann = info["ann_infos"][0]
    assert ann["category_name"] == "vehicle.truck"
    assert ann["size"] == [4.5, 1.9, 1.5]  # (l, w, h)

    # feed through the dataset (lidar frame == ego frame)
    from sgv3d_tpu.data.dataset import RoadSideDataset
    with open(tmp_path / "infos.pkl", "wb") as f:
        pickle.dump(infos, f)
    ds = RoadSideDataset(
        {"final_dim": (32, 64), "H": 54, "W": 96, "bot_pct_lim": (0.0, 0.0),
         "cams": ["CAM_FRONT"], "Ncams": 1},
        ("car", "truck", "pedestrian"), root, str(tmp_path / "infos.pkl"),
        is_train=True, max_objs=8)
    s = ds[0]
    valid = s["gt_labels"] >= 0
    # truck + zero-size pedestrian (gen_info_dair keeps all mapped classes)
    assert valid.sum() == 2
    truck_mask = s["gt_labels"] == 1
    box = s["gt_boxes"][truck_mask][0]
    np.testing.assert_allclose(box[:3], [30.0, 2.0, 0.75], atol=1e-5)
    np.testing.assert_allclose(box[6], 0.3, atol=1e-5)
    # reference height ~ 7 m camera
    assert 6.5 < float(s["reference_heights"][0, 0]) < 7.5


def _fake_rope3d_root(tmp_path, n=3):
    root = tmp_path / "rope3d"
    for sub in ("training/label_2", "training/calib", "training/denorm",
                "training-image_2a", "validation/label_2", "validation/calib",
                "validation/denorm", "validation-image_2", "ImageSets"):
        (root / sub).mkdir(parents=True)
    rng = np.random.default_rng(1)
    names = [f"frame_{i}_cam0" for i in range(n)]
    for i, name in enumerate(names):
        sub_dir = "training" if i < n - 1 else "validation"
        img_dir = "training-image_2a" if i < n - 1 else "validation-image_2"
        Image.fromarray((rng.random((54, 96, 3)) * 255).astype(np.uint8)
                        ).save(root / img_dir / f"{name}.jpg")
        fx = 2100.0 + i * 10
        with open(root / sub_dir / "calib" / f"{name}.txt", "w") as f:
            f.write(f"P2: {fx} 0.0 960.0 0.0 0.0 {fx} 540.0 0.0 "
                    "0.0 0.0 1.0 0.0\n")
        with open(root / sub_dir / "denorm" / f"{name}.txt", "w") as f:
            f.write("0.0 -0.97 -0.24 7.0\n")
        with open(root / sub_dir / "label_2" / f"{name}.txt", "w") as f:
            # camera ~7 m up pitched down: ground at z=30 is at cam y ~ -0.2
            f.write("car 0 0 0.2 100 200 300 400 1.5 1.9 4.5 "
                    "2.0 -0.2 30.0 1.4\n")
            f.write("unknownthing 0 0 0 0 0 0 0 1 1 1 1 1 10 0\n")
    with open(root / "training" / "train.txt", "w") as f:
        f.write("\n".join(names[:n - 1]) + "\n")
    with open(root / "validation" / "val.txt", "w") as f:
        f.write(names[n - 1] + "\n")
    with open(root / "ImageSets" / "train.txt", "w") as f:
        f.write("\n".join(names[:n - 1]) + "\n")
    with open(root / "ImageSets" / "val.txt", "w") as f:
        f.write(names[n - 1] + "\n")
    return str(root), names


def test_rope2kitti_and_info_gen(tmp_path):
    root, names = _fake_rope3d_root(tmp_path)
    target = str(tmp_path / "rope3d-kitti")
    rope3d.rope2kitti(root, target)
    with open(os.path.join(target, "map_token2id.json")) as f:
        token2id = json.load(f)
    assert len(token2id) == 3
    # label_2 keeps original class capitalised; label_eval merges
    l2 = open(os.path.join(target, "training/label_2/000000.txt")).read()
    le = open(os.path.join(target, "training/label_eval/000000.txt")).read()
    assert l2.startswith("Car") and le.startswith("Car")
    assert "unknownthing" not in l2 and "Unknownthing" not in l2
    calib = open(os.path.join(target, "training/calib/000000.txt")).read()
    assert "Tr_velo_to_cam:" in calib

    # ImageSets train_dair/val_dair then infos
    with open(os.path.join(target, "ImageSets/train_dair.txt"), "w") as f:
        f.write("000000\n000001\n")
    with open(os.path.join(target, "ImageSets/val_dair.txt"), "w") as f:
        f.write("000002\n")
    rope3d.gen_info_rope3d_kitti_main(target)
    with open(os.path.join(target, "rope3d_12hz_infos_train_dair.pkl"),
              "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    ann = infos[0]["ann_infos"][0]
    assert ann["category_name"] == "vehicle.car"
    # lidar z = camera y mapped through denorm-derived cam2lidar + h/2 lift
    assert -1.0 < ann["translation"][2] < 2.5
    # camera height encoded in the cam2lidar translation
    np.testing.assert_allclose(
        infos[0]["cam_infos"]["CAM_FRONT"]["calibrated_sensor"]["translation"][2],
        7.0, atol=0.01)


def test_gen_info_rope3d_raw(tmp_path):
    root, names = _fake_rope3d_root(tmp_path)
    infos = rope3d.generate_info_rope3d(root, "train")
    assert len(infos) == 2
    assert infos[0]["cam_infos"]["CAM_FRONT"]["filename"].startswith(
        "training-image_2a/")
    assert len(infos[0]["ann_infos"]) == 1


def test_gen_unlabeled_split(tmp_path):
    root, names = _fake_rope3d_root(tmp_path)
    target = str(tmp_path / "rope3d-kitti")
    rope3d.rope2kitti(root, target)
    sets = os.path.join(target, "ImageSets")
    # labeled scenes = first frame only (fx 2100)
    with open(os.path.join(sets, "train_dair.txt"), "w") as f:
        f.write("000000\n")
    with open(os.path.join(sets, "val_dair.txt"), "w") as f:
        f.write("000000\n")
    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("000000\n000001\n")
    with open(os.path.join(sets, "val.txt"), "w") as f:
        f.write("000002\n")
    out = rope3d.gen_unlabeled_split(target, sets)
    # frames with fx 2110, 2120 are unlabeled scenes
    assert sorted(out) == ["000001", "000002"]


def test_pcd2bin_ascii_and_binary(tmp_path):
    from converters.pcd import pcd2bin, read_pcd
    pts = np.array([[1.0, 2.0, 3.0, 128.0], [4.0, 5.0, 6.0, 255.0]],
                   np.float32)
    header = ("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
              "TYPE F F F F\nCOUNT 1 1 1 1\nWIDTH 2\nHEIGHT 1\n"
              "VIEWPOINT 0 0 0 1 0 0 0\nPOINTS 2\n")
    ascii_path = tmp_path / "a.pcd"
    with open(ascii_path, "w") as f:
        f.write(header + "DATA ascii\n")
        for row in pts:
            f.write(" ".join(str(v) for v in row) + "\n")
    bin_pcd_path = tmp_path / "b.pcd"
    with open(bin_pcd_path, "wb") as f:
        f.write((header + "DATA binary\n").encode())
        f.write(pts.tobytes())
    for src in (ascii_path, bin_pcd_path):
        out = tmp_path / (src.stem + ".bin")
        pcd2bin(str(src), str(out))
        arr = np.fromfile(out, np.float32).reshape(-1, 4)
        np.testing.assert_allclose(arr[:, :3], pts[:, :3])
        np.testing.assert_allclose(arr[:, 3], pts[:, 3] / 255.0)
