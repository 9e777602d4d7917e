"""Rope3D converters: raw -> info pkl, raw -> KITTI-format tree (rope3d-kitti),
rope3d-kitti -> info pkls, and the unlabeled split generator.

Parity targets: /root/reference/scripts/gen_info_rope3d.py,
scripts/data_converter/rope2kitti.py, scripts/gen_info_rope3d_kitti.py,
scripts/data_preprocess/gen_unlabeled_split.py.
"""
from __future__ import annotations

import json
import math
import os
import pickle
import shutil

import numpy as np

from sgv3d_tpu.geom import rodrigues

CATEGORY_MAP = {"car": "Car", "van": "Car", "truck": "Car", "bus": "Car",
                "pedestrian": "Pedestrian", "cyclist": "Cyclist",
                "motorcyclist": "Cyclist", "tricyclist": "Cyclist"}

NAME2NUSCENES = {
    "car": "vehicle.car", "van": "vehicle.car", "truck": "vehicle.truck",
    "bus": "vehicle.bus.rigid", "cyclist": "vehicle.bicycle",
    "tricyclist": "vehicle.trailer", "motorcyclist": "vehicle.motorcycle",
    "pedestrian": "human.pedestrian.adult",
    "trafficcone": "movable_object.trafficcone",
}

TRAIN_IMG_DIRS = ("training-image_2a", "training-image_2b",
                  "training-image_2c", "training-image_2d")
VAL_IMG_DIRS = ("validation-image_2",)

LABEL_FIELDS = ("type", "truncated", "occluded", "alpha", "xmin", "ymin",
                "xmax", "ymax", "dh", "dw", "dl", "lx", "ly", "lz", "ry")


def load_denorm(path: str) -> np.ndarray:
    with open(path) as f:
        return np.array([float(v) for v in f.readlines()[0].split(" ")])


def load_calib(path: str) -> np.ndarray:
    with open(path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if parts[0] == "P2:":
                return np.array(parts[1:13], np.float32).reshape(3, 4)[:3, :3]
    raise ValueError(f"no P2 in {path}")


def alpha2roty(alpha: float, pos) -> float:
    ry = alpha + np.arctan2(pos[0], pos[2])
    if ry > np.pi:
        ry -= 2 * np.pi
    if ry < -np.pi:
        ry += 2 * np.pi
    return ry


def clip2pi(ry: float) -> float:
    if ry > 2 * np.pi:
        ry -= 2 * np.pi
    if ry < -2 * np.pi:
        ry += 2 * np.pi
    return ry


def yaw_to_quat_wxyz(yaw: float) -> list:
    return [math.cos(yaw / 2.0), 0.0, 0.0, math.sin(yaw / 2.0)]


def get_cam2lidar(denorm_file: str):
    """cam->lidar from a denorm file (gen_info_rope3d.py:56-86):
    Rz @ Rx @ rodrigues with translation (0, 0, cam_height)."""
    denorm = load_denorm(denorm_file)
    Rx = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])
    Rz = np.array([[0, 1.0, 0], [-1.0, 0, 0], [0, 0, 1.0]])
    origin = np.array([0.0, 1.0, 0.0])
    target = -denorm[:3] / np.linalg.norm(denorm[:3])
    theta = math.acos(float(np.clip(np.inner(target, origin), -1, 1)))
    n = np.cross(target, origin)
    n = n / np.linalg.norm(n)
    cam2lidar = Rz @ (Rx @ rodrigues(n * theta))
    d = abs(denorm[3]) / np.linalg.norm(denorm[:3])
    Tr = np.eye(4)
    Tr[:3, :3] = cam2lidar
    Tr[:3, 3] = [0, 0, d]
    return cam2lidar, [0, 0, d], Tr, denorm


def _parse_label_rows(label_file: str):
    rows = []
    with open(label_file) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 15:
                continue
            rows.append(dict(zip(LABEL_FIELDS, parts)))
    return rows


def _row_to_lidar(row: dict, Tr_cam2lidar: np.ndarray):
    """One camera-frame label row -> (name, lidar box [x,y,z,l,w,h,yaw])."""
    alpha = float(row["alpha"])
    pos = np.array([float(row["lx"]), float(row["ly"]), float(row["lz"])],
                   np.float32)
    ry = float(row["ry"])
    if alpha > np.pi:
        alpha -= 2 * np.pi
        ry = alpha2roty(alpha, pos)
    alpha = clip2pi(alpha)
    ry = clip2pi(ry)
    yaw_lidar = 0.5 * np.pi - ry
    dim = [float(row["dl"]), float(row["dw"]), float(row["dh"])]
    if sum(dim) == 0:
        return None
    loc_cam = np.array([pos[0], pos[1], pos[2], 1.0])
    loc_lidar = (Tr_cam2lidar @ loc_cam)[:3]
    loc_lidar[2] += 0.5 * float(row["dh"])
    return row["type"].lower(), loc_lidar, dim, yaw_lidar, alpha, row


# ---------------------------------------------------------------------------
# raw rope3d -> info pkl
# ---------------------------------------------------------------------------

def generate_info_rope3d(rope3d_root: str, split: str = "train") -> list:
    src_dir = os.path.join(rope3d_root,
                           "training" if split == "train" else "validation")
    img_dirs = TRAIN_IMG_DIRS if split == "train" else VAL_IMG_DIRS
    split_txt = os.path.join(
        src_dir, "train.txt" if split == "train" else "val.txt")
    idx_list = [x.strip() for x in open(split_txt).readlines()]

    valid = []
    for index in idx_list:
        for sub in img_dirs:
            if os.path.exists(os.path.join(rope3d_root, sub, index + ".jpg")):
                valid.append((sub, index))

    infos = []
    for sub, index in valid:
        calib_file = os.path.join(src_dir, "calib", index + ".txt")
        denorm_file = os.path.join(src_dir, "denorm", index + ".txt")
        label_file = os.path.join(src_dir, "label_2", index + ".txt")
        K = load_calib(calib_file)
        cam2lidar, translation, Tr_cam2lidar, denorm = get_cam2lidar(
            denorm_file)
        ego_pose = {"translation": [0.0, 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0], "token": index,
                    "timestamp": 1000000}
        cam_info = dict(
            sample_token=index, timestamp=1000000, is_key_frame=True,
            height=1080, width=1920,
            filename=os.path.join(sub, index + ".jpg"), ego_pose=ego_pose,
            calibrated_sensor=dict(
                token=index, sensor_token=index, translation=translation,
                rotation_matrix=cam2lidar.tolist(),
                camera_intrinsic=K.tolist()),
            denorm=denorm.tolist())
        ann_infos = []
        if os.path.exists(label_file):
            for row in _parse_label_rows(label_file):
                if row["type"] not in NAME2NUSCENES:
                    continue
                parsed = _row_to_lidar(row, Tr_cam2lidar)
                if parsed is None:
                    continue
                _, loc, dim, yaw, _, r = parsed
                ann_infos.append(dict(
                    category_name=NAME2NUSCENES[r["type"]],
                    translation=loc.tolist(), rotation=yaw_to_quat_wxyz(yaw),
                    size=dim, prev="", next="", sample_token=index,
                    instance_token=index, token=index,
                    visibility_token=str(int(r["occluded"])),
                    num_lidar_pts=3, num_radar_pts=0,
                    velocity=[0.0, 0.0, 0.0]))
        infos.append(dict(
            sample_token=index, timestamp=1000000, scene_token=index,
            cam_infos={"CAM_FRONT": cam_info}, lidar_infos={"LIDAR_TOP": {}},
            sweeps=[], ann_infos=ann_infos))
    return infos


# ---------------------------------------------------------------------------
# raw rope3d -> rope3d-kitti tree
# ---------------------------------------------------------------------------

def convert_label(src_label_file: str, dest_label_file: str,
                  class_merge: bool = True) -> None:
    """KITTI label rewrite: class merge (or Capitalize), truncated clamp,
    alpha/ry normalisation (rope2kitti.py:105-134)."""
    new_lines = []
    for line in open(src_label_file):
        label = line.strip().split(" ")
        if label[0] not in CATEGORY_MAP:
            continue
        label[0] = (CATEGORY_MAP[label[0]] if class_merge
                    else label[0].capitalize())
        truncated = int(float(label[1]))
        label[1] = str(0.0 if truncated > 0 else truncated)
        alpha = float(label[3])
        pos = np.array([float(label[11]), float(label[12]),
                        float(label[13])], np.float32)
        if np.sum(pos) < 10e-9:
            continue
        ry = float(label[14])
        if alpha > np.pi:
            alpha -= 2 * np.pi
            ry = alpha2roty(alpha, pos)
        label[3] = str(alpha)
        label[14] = str(ry)
        new_lines.append(" ".join(label))
    with open(dest_label_file, "w") as f:
        for line in new_lines:
            f.write(line + "\n")


def convert_calib(src_calib_file: str, src_denorm_file: str,
                  dest_calib_file: str) -> None:
    with open(src_calib_file) as f:
        P2 = np.array(f.readlines()[0].strip().split(" ")[1:], np.float32)
    _, _, Tr_cam2velo, _ = get_cam2lidar(src_denorm_file)
    Tr_velo2cam = np.linalg.inv(Tr_cam2velo)
    entries = [
        ("P0", np.zeros((3, 4))), ("P1", np.zeros((3, 4))), ("P2", P2),
        ("P3", np.zeros((3, 4))), ("R0_rect", np.identity(3)),
        ("Tr_velo_to_cam", Tr_velo2cam[:3, :]),
        ("Tr_imu_to_velo", np.zeros((3, 4))),
    ]
    with open(dest_calib_file, "w") as f:
        for key, val in entries:
            val = np.asarray(val).flatten()
            f.write(key + ": " + " ".join("%.12e" % v for v in val) + "\n")


def rope2kitti(source_root: str, target_root: str) -> None:
    img_id = 0
    map_token2id = {}
    for split in ("train", "val"):
        src_dir = os.path.join(source_root,
                               "training" if split == "train" else "validation")
        img_dirs = TRAIN_IMG_DIRS if split == "train" else VAL_IMG_DIRS
        for sub in ("training/image_2", "training/label_2",
                    "training/label_eval", "training/calib",
                    "training/denorm", "ImageSets"):
            os.makedirs(os.path.join(target_root, sub), exist_ok=True)
        split_txt = os.path.join(source_root, "ImageSets", split + ".txt")
        if not os.path.exists(split_txt):
            split_txt = os.path.join(
                src_dir, "train.txt" if split == "train" else "val.txt")
        idx_list = [x.strip() for x in open(split_txt).readlines()]
        id_list = []
        for index in idx_list:
            src_img = None
            for d in img_dirs:
                p = os.path.join(source_root, d, index + ".jpg")
                if os.path.exists(p):
                    src_img = p
                    break
            if src_img is None:
                continue
            sid = f"{img_id:06d}"
            map_token2id[index] = sid
            id_list.append(img_id)
            dst = os.path.join(target_root, "training")
            if not os.path.exists(os.path.join(dst, "image_2", sid + ".jpg")):
                shutil.copyfile(src_img,
                                os.path.join(dst, "image_2", sid + ".jpg"))
            convert_calib(os.path.join(src_dir, "calib", index + ".txt"),
                          os.path.join(src_dir, "denorm", index + ".txt"),
                          os.path.join(dst, "calib", sid + ".txt"))
            convert_label(os.path.join(src_dir, "label_2", index + ".txt"),
                          os.path.join(dst, "label_2", sid + ".txt"),
                          class_merge=False)
            convert_label(os.path.join(src_dir, "label_2", index + ".txt"),
                          os.path.join(dst, "label_eval", sid + ".txt"))
            shutil.copyfile(os.path.join(src_dir, "denorm", index + ".txt"),
                            os.path.join(dst, "denorm", sid + ".txt"))
            img_id += 1
        with open(os.path.join(target_root, "ImageSets", split + ".txt"),
                  "w") as f:
            for i in id_list:
                f.write(f"{i:06d}\n")
    with open(os.path.join(target_root, "map_token2id.json"), "w") as f:
        json.dump(map_token2id, f)


# ---------------------------------------------------------------------------
# rope3d-kitti -> info pkls
# ---------------------------------------------------------------------------

def _load_calib_kitti(calib_file: str):
    P2 = tr = None
    with open(calib_file) as f:
        for line in f:
            parts = line.strip().split(" ")
            if parts[0] == "P2:":
                P2 = np.array(parts[1:13], np.float32).reshape(3, 4)
            elif parts[0] == "Tr_velo_to_cam:":
                tr = np.array(parts[1:13], np.float32).reshape(3, 4)
    Tr = np.concatenate([tr, np.array([[0, 0, 0, 1]], np.float32)], axis=0)
    return Tr, P2


def generate_info_rope3d_kitti(data_root: str, split: str = "train_dair",
                               load_gt: bool = True) -> list:
    split_file = os.path.join(data_root, "ImageSets", split + ".txt")
    split_list = [x.strip() for x in open(split_file).readlines()]
    if split == "unlabeled_data":
        split_list = list(set(split_list))
    token2sample = {}
    map_file = os.path.join(data_root, "map_token2id.json")
    if os.path.exists(map_file):
        with open(map_file) as f:
            token2sample = json.load(f)

    infos = []
    for sample_id in split_list:
        if not sample_id.isdigit():
            sample_id = token2sample[sample_id]
        calib_file = os.path.join(data_root, "training/calib",
                                  sample_id + ".txt")
        Tr_velo2cam, P2 = _load_calib_kitti(calib_file)
        Tr_cam2velo = np.linalg.inv(Tr_velo2cam)
        token = "training/image_2/" + sample_id + ".jpg"
        ego_pose = {"translation": [0.0, 0.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0], "token": token,
                    "timestamp": 1000000}
        denorm_file = os.path.join(data_root, "training/denorm",
                                   sample_id + ".txt")
        denorm = (load_denorm(denorm_file).tolist()
                  if os.path.exists(denorm_file) else None)
        cam_info = dict(
            sample_token=token, timestamp=1000000, is_key_frame=True,
            height=1080, width=1920, filename=token, ego_pose=ego_pose,
            calibrated_sensor=dict(
                token=token, sensor_token=token,
                translation=Tr_cam2velo[:3, 3].tolist(),
                rotation_matrix=Tr_cam2velo[:3, :3].tolist(),
                camera_intrinsic=P2[:3, :3].tolist()),
            denorm=denorm)
        ann_infos = []
        label_file = os.path.join(data_root, "training/label_2",
                                  sample_id + ".txt")
        if load_gt and os.path.exists(label_file):
            for row in _parse_label_rows(label_file):
                name = row["type"].lower()
                if name not in NAME2NUSCENES:
                    continue
                parsed = _row_to_lidar(row, Tr_cam2velo)
                if parsed is None:
                    continue
                _, loc, dim, yaw, _, r = parsed
                ann_infos.append(dict(
                    category_name=NAME2NUSCENES[name],
                    translation=loc.tolist(), rotation=yaw_to_quat_wxyz(yaw),
                    yaw_lidar=yaw, size=dim, prev="", next="",
                    sample_token=token, instance_token=token, token=token,
                    visibility_token="0", num_lidar_pts=3, num_radar_pts=0,
                    velocity=[0.0, 0.0, 0.0]))
        infos.append(dict(
            sample_token=token, timestamp=1000000, scene_token=token,
            cam_infos={"CAM_FRONT": cam_info},
            lidar_infos={"LIDAR_TOP": dict(
                sample_token=token, ego_pose=ego_pose, timestamp=1000000,
                filename=None,
                calibrated_sensor=cam_info["calibrated_sensor"])},
            sweeps=[], ann_infos=ann_infos))
    return infos


def gen_info_rope3d_kitti_main(data_root: str) -> None:
    for split, name in (("train_dair", "rope3d_12hz_infos_train_dair.pkl"),
                        ("val_dair", "rope3d_12hz_infos_val_dair.pkl")):
        infos = generate_info_rope3d_kitti(data_root, split=split)
        with open(os.path.join(data_root, name), "wb") as f:
            pickle.dump(infos, f)
    ssdg = os.path.join(data_root, "ImageSets", "train_ssdg.txt")
    if os.path.exists(ssdg):
        infos = generate_info_rope3d_kitti(data_root, split="train_ssdg")
        with open(os.path.join(data_root,
                               "rope3d_12hz_infos_train_ssdg.pkl"), "wb") as f:
            pickle.dump(infos, f)
    unlabeled = os.path.join(data_root, "ImageSets", "unlabeled_data.txt")
    if os.path.exists(unlabeled) and "gen" not in data_root:
        infos = generate_info_rope3d_kitti(data_root, split="unlabeled_data",
                                           load_gt=False)
        with open(os.path.join(
                data_root, "rope3d_12hz_infos_unlabeled_data.pkl"), "wb") as f:
            pickle.dump(infos, f)


# ---------------------------------------------------------------------------
# unlabeled split (frames whose focal length appears in no labeled scene)
# ---------------------------------------------------------------------------

def gen_unlabeled_split(src_root: str, labeled_split_root: str) -> list:
    """Pick frames whose P2 focal length appears in neither the DAIR train
    nor val scenes (gen_unlabeled_split.py:55-84); writes and returns them."""
    def read_split(path):
        return [x.strip() for x in open(path).readlines()]

    def fx_of(frame_id):
        _, P2 = _load_calib_kitti(
            os.path.join(src_root, "training/calib", frame_id + ".txt"))
        return float(P2[0, 0])

    train_ids = read_split(os.path.join(labeled_split_root, "train_dair.txt"))
    val_ids = read_split(os.path.join(labeled_split_root, "val_dair.txt"))
    raw_ids = (read_split(os.path.join(src_root, "ImageSets/train.txt"))
               + read_split(os.path.join(src_root, "ImageSets/val.txt")))
    labeled_fx = {fx_of(i) for i in train_ids + val_ids}
    unlabeled = [i for i in raw_ids if fx_of(i) not in labeled_fx]
    out_path = os.path.join(src_root, "ImageSets", "unlabeled_data.txt")
    with open(out_path, "w") as f:
        for i in unlabeled:
            f.write(i + "\n")
    return unlabeled
