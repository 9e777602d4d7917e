"""DAIR-V2X-I converters: raw -> KITTI-format tree, and raw -> info pkl.

Parity with /root/reference/scripts/data_converter/dair2kitti.py +
gen_kitti/* and /root/reference/scripts/gen_info_dair.py — including the
reference's quirks: the w/l column swap when writing KITTI labels
(label_json2kitti.py:19), the negated rotation (:22), the class-merge
rewrites (Truck/Van/Bus->Car, rider variants->Cyclist), and the zero-size
filter.
"""
from __future__ import annotations

import json
import math
import os
import pickle
import random
import shutil

import numpy as np

from sgv3d_tpu.evalkit.kitti_writer import camera_alpha_yaw

NAME2NUSCENES = {
    "car": "vehicle.car", "van": "vehicle.car", "truck": "vehicle.truck",
    "bus": "vehicle.bus.rigid", "cyclist": "vehicle.bicycle",
    "bicycle": "vehicle.bicycle", "tricyclist": "vehicle.bicycle",
    "motorcycle": "vehicle.bicycle", "motorcyclist": "vehicle.bicycle",
    "barrowlist": "vehicle.bicycle", "barrow": "vehicle.bicycle",
    "pedestrian": "human.pedestrian.adult",
    "traffic_cone": "movable_object.trafficcone",
}

CLASS_REWRITES = (("Truck", "Car"), ("Van", "Car"), ("Bus", "Car"),
                  ("Tricyclist", "Cyclist"), ("Motorcyclist", "Cyclist"),
                  ("Barrowlist", "Cyclist"))


def read_json(path):
    with open(path) as f:
        return json.load(f)


def yaw_to_quat_wxyz(yaw: float) -> list:
    return [math.cos(yaw / 2.0), 0.0, 0.0, math.sin(yaw / 2.0)]


def lidar_label_to_camera(labels: list, r_velo2cam: np.ndarray,
                          t_velo2cam: np.ndarray) -> list:
    """In-place: 3d_location lidar->camera, alpha/rotation_y derivation
    (gen_kitti/label_lidarcoord_to_cameracoord.py:104-135)."""
    Tr = np.hstack((r_velo2cam, t_velo2cam))
    for label in labels:
        h = float(label["3d_dimensions"]["h"])
        w = float(label["3d_dimensions"]["w"])
        l = float(label["3d_dimensions"]["l"])
        x = float(label["3d_location"]["x"])
        y = float(label["3d_location"]["y"])
        z = float(label["3d_location"]["z"]) - h / 2
        yaw_lidar = float(label["rotation"])
        bottom_center = [x, y, z]
        center_in_cam = (r_velo2cam @ np.asarray(bottom_center)[:, None]
                         + t_velo2cam)[:, 0]
        alpha, yaw = camera_alpha_yaw([l, w, h], yaw_lidar, bottom_center,
                                      center_in_cam, r_velo2cam, t_velo2cam)
        cam = Tr @ np.array([x, y, z, 1.0])
        label["3d_location"]["x"] = float(cam[0])
        label["3d_location"]["y"] = float(cam[1])
        label["3d_location"]["z"] = float(cam[2])
        label["alpha"] = alpha
        label["rotation_y"] = yaw
    return labels


def write_kitti_label(labels: list, path: str) -> None:
    """Camera-frame labels -> KITTI txt with the reference's column quirks."""
    lines = []
    for it in labels:
        name = str(it["type"]).title()
        for old, new in CLASS_REWRITES:
            if name == old:
                name = new
        dims = it["3d_dimensions"]
        if float(dims["l"]) <= 0:  # label_filter drops zero-size rows
            continue
        loc = it["3d_location"]
        lines.append(" ".join([
            name, str(it.get("truncated_state", 0)),
            str(it.get("occluded_state", 0)), str(it["alpha"]),
            str(it["2d_box"]["xmin"]), str(it["2d_box"]["ymin"]),
            str(it["2d_box"]["xmax"]), str(it["2d_box"]["ymax"]),
            # reference writes (h, l, w) via the i9/i11/i10 swap
            str(dims["h"]), str(dims["l"]), str(dims["w"]),
            str(loc["x"]), str(loc["y"]), str(loc["z"]),
            str(-float(it["rotation"])),  # negated lidar rotation
        ]))
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))


def write_calib(cam_K, r_velo2cam, t_velo2cam, path: str) -> None:
    P2 = np.zeros((3, 4))
    P2[:3, :3] = np.asarray(cam_K).reshape(3, 3)
    tr = np.hstack((r_velo2cam, t_velo2cam)).reshape(-1)
    with open(path, "w") as f:
        p2 = " ".join(str(v) for v in P2.reshape(-1))
        for key in ("P0", "P1", "P2", "P3"):
            f.write(f"{key}: {p2}\n")
        f.write("R0_rect: 1 0 0 0 1 0 0 0 1\n")
        f.write("Tr_velo_to_cam: " + " ".join(str(v) for v in tr) + "\n")
        f.write("Tr_imu_to_velo: " + " ".join(str(v) for v in tr) + "\n")


def dair2kitti(source_root: str, target_root: str, split_path: str) -> None:
    """Raw DAIR-V2X-I tree -> KITTI-format tree."""
    os.makedirs(os.path.join(target_root, "training/calib"), exist_ok=True)
    os.makedirs(os.path.join(target_root, "training/label_2"), exist_ok=True)
    os.makedirs(os.path.join(target_root, "ImageSets"), exist_ok=True)
    img_dst = os.path.join(target_root, "training/image_2")
    if not os.path.exists(img_dst) and os.path.exists(
            os.path.join(source_root, "image")):
        shutil.copytree(os.path.join(source_root, "image"), img_dst)

    label_dir = os.path.join(source_root, "label/camera")
    for name in sorted(os.listdir(label_dir)):
        if not name.endswith(".json"):
            continue
        sid = name[:-5]
        calib = read_json(os.path.join(
            source_root, "calib/virtuallidar_to_camera", sid + ".json"))
        r = np.asarray(calib["rotation"]).reshape(3, 3)
        t = np.asarray(calib["translation"]).reshape(3, 1)
        labels = read_json(os.path.join(label_dir, name))
        labels = lidar_label_to_camera(labels, r, t)
        write_kitti_label(
            labels, os.path.join(target_root, "training/label_2", sid + ".txt"))
        cam_K = read_json(os.path.join(
            source_root, "calib/camera_intrinsic", sid + ".json"))["cam_K"]
        write_calib(cam_K, r, t,
                    os.path.join(target_root, "training/calib", sid + ".txt"))

    split = read_json(split_path)
    sets = os.path.join(target_root, "ImageSets")
    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("\n".join(split["train"]) + "\n")
    with open(os.path.join(sets, "val.txt"), "w") as f:
        f.write("\n".join(split["val"]) + "\n")
    with open(os.path.join(sets, "trainval.txt"), "w") as f:
        f.write("\n".join(split["train"] + split["val"]) + "\n")
    with open(os.path.join(sets, "test.txt"), "w") as f:
        f.write("")


def generate_info_dair(dair_root: str, split: str, split_json: str) -> list:
    """Raw DAIR-V2X-I -> nuScenes-like info list (gen_info_dair.py:111-196)."""
    split_infos = read_json(split_json)
    split_list = split_infos[split]
    if "raw" in split_infos and split == "train":
        split_list = split_infos["train"] + split_infos["val"]
        random.shuffle(split_list)

    infos = []
    for sample_id in split_list:
        token = "image/" + sample_id + ".jpg"
        calib = read_json(os.path.join(
            dair_root, "calib/virtuallidar_to_camera", sample_id + ".json"))
        r_velo2cam = np.asarray(calib["rotation"]).reshape(3, 3)
        t_velo2cam = np.asarray(calib["translation"]).reshape(3)
        K = np.asarray(read_json(os.path.join(
            dair_root, "calib/camera_intrinsic",
            sample_id + ".json"))["cam_K"]).reshape(3, 3)

        Tr = np.eye(4)
        Tr[:3, :3] = r_velo2cam
        Tr[:3, 3] = t_velo2cam
        Tr_cam2velo = np.linalg.inv(Tr)

        ego_pose = {"translation": [0.0, 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0], "token": token,
                    "timestamp": 1000000}
        cam_info = dict(
            sample_token=token, timestamp=1000000, is_key_frame=True,
            height=1080, width=1920, filename=token, ego_pose=ego_pose,
            calibrated_sensor=dict(
                token=token, sensor_token=token,
                translation=Tr_cam2velo[:3, 3].tolist(),
                rotation_matrix=Tr_cam2velo[:3, :3].tolist(),
                camera_intrinsic=K.tolist()),
        )
        ann_infos = []
        label_path = os.path.join(dair_root, "label/camera",
                                  sample_id + ".json")
        load_gt = sample_id not in split_infos["val"]
        if load_gt and os.path.exists(label_path):
            for item in read_json(label_path):
                cat = item["type"].lower()
                if cat not in NAME2NUSCENES:
                    continue
                x = float(item["3d_location"]["x"])
                y = float(item["3d_location"]["y"])
                z = float(item["3d_location"]["z"])
                h = float(item["3d_dimensions"]["h"])
                w = float(item["3d_dimensions"]["w"])
                l = float(item["3d_dimensions"]["l"])
                yaw = float(item["rotation"])
                ann_infos.append(dict(
                    category_name=NAME2NUSCENES[cat],
                    translation=[x, y, z],
                    rotation=yaw_to_quat_wxyz(yaw),
                    yaw_lidar=yaw,
                    size=[l, w, h],
                    prev="", next="", sample_token=token,
                    instance_token=token, token=token, visibility_token="0",
                    num_lidar_pts=3, num_radar_pts=0,
                    velocity=[0.0, 0.0, 0.0]))
        infos.append(dict(
            sample_token=token, timestamp=1000000, scene_token=token,
            cam_infos={"CAM_FRONT": cam_info},
            lidar_infos={"LIDAR_TOP": dict(
                sample_token=token, ego_pose=ego_pose, timestamp=1000000,
                filename="velodyne/" + sample_id + ".pcd",
                calibrated_sensor=cam_info["calibrated_sensor"])},
            sweeps=[], ann_infos=ann_infos))
    return infos


def gen_info_dair_main(dair_root: str, split_json: str) -> None:
    train = generate_info_dair(dair_root, "train", split_json)
    val = generate_info_dair(dair_root, "val", split_json)
    with open(os.path.join(dair_root, "dair_12hz_infos_train.pkl"), "wb") as f:
        pickle.dump(train, f)
    with open(os.path.join(dair_root, "dair_12hz_infos_val.pkl"), "wb") as f:
        pickle.dump(val, f)
    trainval = list(train)
    for info in val:
        info = dict(info)
        info["ann_infos"] = []
        trainval.append(info)
    random.shuffle(trainval)
    with open(os.path.join(dair_root, "dair_12hz_infos_trainval.pkl"),
              "wb") as f:
        pickle.dump(trainval, f)
