"""Predictions -> per-frame KITTI label txt files.

Parity with /root/reference/evaluators/result2kitti.py (:212 kitti-format
roots, :270 raw DAIR, :330 raw Rope3D) including the 4-decimal rounding, the
score>0.45 filter, the h/l/w column order the reference writes (i9=h, i10=l,
i11=w; :255,315,381), the alpha/yaw derivation from projected corners, and
the 2D box clipping. Calibration providers abstract the three dataset
layouts.
"""
from __future__ import annotations

import json
import math
import os
from typing import Callable, Mapping

import numpy as np

CATEGORY_MAP = {"car": "Car", "van": "Car", "truck": "Car", "bus": "Car",
                "pedestrian": "Pedestrian", "bicycle": "Cyclist",
                "trailer": "Cyclist", "motorcycle": "Cyclist"}


def normalize_angle(angle: float) -> float:
    alpha_arctan = math.atan(math.tan(angle))
    if math.cos(angle) < 0:
        alpha_arctan += math.pi
    return alpha_arctan


def lidar_corners(obj_size, yaw_lidar, center_lidar) -> np.ndarray:
    """8 corners (8, 3) of a box whose z is the bottom plane at center_lidar."""
    l, w, h = obj_size
    rot = np.array(
        [[math.cos(yaw_lidar), -math.sin(yaw_lidar), 0.0],
         [math.sin(yaw_lidar), math.cos(yaw_lidar), 0.0], [0.0, 0.0, 1.0]])
    corners = np.array(
        [[l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2],
         [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2],
         [0, 0, 0, 0, h, h, h, h]], dtype=np.float64)
    return (rot @ corners + np.asarray(center_lidar, np.float64)[:, None]).T


def camera_alpha_yaw(obj_size, yaw_lidar, center_lidar, center_in_cam,
                     r_velo2cam, t_velo2cam):
    """alpha and yaw in the camera frame from the projected corner direction.
    Mirrors get_camera_3d_8points (/root/reference/evaluators/result2kitti.py:99-124)."""
    corners = lidar_corners(obj_size, yaw_lidar, center_lidar)  # (8, 3)
    corners_cam = (r_velo2cam @ corners.T) + t_velo2cam.reshape(3, 1)
    x0, z0 = corners_cam[0, 0], corners_cam[2, 0]
    x3, z3 = corners_cam[0, 3], corners_cam[2, 3]
    yaw = math.atan2(-(z0 - z3), x0 - x3)
    alpha = yaw - math.atan2(float(center_in_cam[0]), float(center_in_cam[2]))
    if alpha > math.pi:
        alpha -= 2.0 * math.pi
    if alpha <= -math.pi:
        alpha += 2.0 * math.pi
    return normalize_angle(alpha), yaw


def project_box2d(corners_lidar: np.ndarray, velo2cam: np.ndarray,
                  intrinsic34: np.ndarray, img_size=(1920, 1080)) -> np.ndarray:
    ext = np.concatenate(
        [corners_lidar, np.ones((corners_lidar.shape[0], 1))], axis=1)
    cam = velo2cam @ ext.T
    uv = intrinsic34 @ cam
    uv = uv[:2] / uv[2]
    box = np.array([uv[0].min(), uv[1].min(), uv[0].max(), uv[1].max()])
    box[0] = max(box[0], 0.0)
    box[1] = max(box[1], 0.0)
    box[2] = min(box[2], img_size[0])
    box[3] = min(box[3], img_size[1])
    return box


# ---------------------------------------------------------------------------
# Calibration providers (per dataset layout)
# ---------------------------------------------------------------------------

def load_denorm(path: str) -> np.ndarray:
    with open(path) as f:
        return np.array([float(v) for v in f.readlines()[0].split(" ")])


def get_cam2lidar_from_denorm(denorm: np.ndarray) -> np.ndarray:
    """4x4 cam->lidar from a ground-plane denorm file (Rope3D convention:
    Rz @ Rx @ rodrigues, translation (0, 0, cam_height));
    parity with /root/reference/scripts/gen_info_rope3d.py:56-86."""
    from sgv3d_tpu.geom import rodrigues

    Rx = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])
    Rz = np.array([[0, 1.0, 0], [-1.0, 0, 0], [0, 0, 1.0]])
    origin = np.array([0.0, 1.0, 0.0])
    target = -denorm[:3] / np.linalg.norm(denorm[:3])
    theta = math.acos(float(np.clip(np.inner(target, origin), -1, 1)))
    n = np.cross(target, origin)
    n = n / np.linalg.norm(n)
    cam2lidar = rodrigues(n * theta)
    cam2lidar = Rz @ (Rx @ cam2lidar)
    d = abs(denorm[3]) / np.linalg.norm(denorm[:3])
    Tr = np.eye(4)
    Tr[:3, :3] = cam2lidar
    Tr[:3, 3] = [0, 0, d]
    return Tr


def kitti_root_calib(data_root: str):
    """Calib provider for kitti-format roots (dair-v2x-i-kitti, rope3d-kitti):
    reads training/calib/<id>.txt with P2 and Tr_velo_to_cam rows."""
    def provider(sample_token: str):
        sample_id = int(os.path.splitext(os.path.basename(sample_token))[0])
        path = os.path.join(data_root, "training/calib", f"{sample_id:06d}.txt")
        P2 = None
        tr = None
        with open(path) as f:
            for line in f:
                parts = line.strip().split(" ")
                if parts[0] == "P2:":
                    P2 = np.array(parts[1:13], np.float32).reshape(3, 4)
                elif parts[0] == "Tr_velo_to_cam:":
                    tr = np.array(parts[1:13], np.float32).reshape(3, 4)
        velo2cam = np.eye(4)
        velo2cam[:3] = tr
        intrinsic34 = np.concatenate([P2[:3, :3], np.zeros((3, 1))], axis=1)
        return sample_id, velo2cam, intrinsic34
    return provider


def dair_raw_calib(data_root: str):
    """Calib provider for the raw DAIR-V2X-I layout (json calib files)."""
    def provider(sample_token: str):
        sample_id = int(os.path.splitext(os.path.basename(sample_token))[0])
        with open(os.path.join(
                data_root, "calib/camera_intrinsic",
                f"{sample_id:06d}.json")) as f:
            K = np.array(json.load(f)["cam_K"]).reshape(3, 3)
        with open(os.path.join(
                data_root, "calib/virtuallidar_to_camera",
                f"{sample_id:06d}.json")) as f:
            j = json.load(f)
        velo2cam = np.eye(4)
        if "Tr_velo_to_cam" in j:
            velo2cam[:3] = np.array(j["Tr_velo_to_cam"]).reshape(3, 4)
        else:
            velo2cam[:3, :3] = np.array(j["rotation"])
            velo2cam[:3, 3] = np.array(j["translation"]).flatten()
        intrinsic34 = np.concatenate([K, np.zeros((3, 1))], axis=1)
        return sample_id, velo2cam, intrinsic34
    return provider


def rope3d_raw_calib(data_root: str, token2id: Mapping[str, int]):
    """Calib provider for the raw Rope3D layout (denorm files + token map)."""
    def provider(sample_token: str):
        sample_id = int(token2id[sample_token])
        denorm_file = os.path.join(data_root, "training/denorm",
                                   sample_token + ".txt")
        calib_file = os.path.join(data_root, "training/calib",
                                  sample_token + ".txt")
        if not os.path.exists(denorm_file):
            denorm_file = os.path.join(data_root, "validation/denorm",
                                       sample_token + ".txt")
            calib_file = os.path.join(data_root, "validation/calib",
                                      sample_token + ".txt")
        Tr_cam2lidar = get_cam2lidar_from_denorm(load_denorm(denorm_file))
        velo2cam = np.linalg.inv(Tr_cam2lidar)
        P2 = None
        with open(calib_file) as f:
            for line in f:
                parts = line.strip().split(" ")
                if parts[0] == "P2:":
                    P2 = np.array(parts[1:13], np.float32).reshape(3, 4)
        intrinsic34 = np.concatenate([P2[:3, :3], np.zeros((3, 1))], axis=1)
        return sample_id, velo2cam, intrinsic34
    return provider


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def result2kitti(results: Mapping[str, list], results_path: str,
                 calib_provider: Callable, score_threshold: float = 0.45,
                 demo: bool = False, gt_label_dir: str | None = None,
                 pcd_dir: str | None = None) -> str:
    """Write one KITTI txt per frame from a results dict (the in-memory
    equivalent of results_nusc.json["results"]): token -> list of
    {translation, size(w, l, h), box_yaw, detection_score, detection_name}.

    `demo=True` additionally renders `<results_path>/demo/<id>.jpg` BEV
    images of predictions vs GT (reference `demo=` flag,
    /root/reference/evaluators/result2kitti.py:263-267), over the lidar
    point cloud when `pcd_dir` contains `<id>.bin` files.

    Returns the directory containing the label files.
    """
    out_dir = os.path.join(results_path, "data")
    os.makedirs(out_dir, exist_ok=True)
    for sample_token, preds in results.items():
        sample_id, velo2cam, intrinsic34 = calib_provider(sample_token)
        r_velo2cam = velo2cam[:3, :3]
        t_velo2cam = velo2cam[:3, 3:4]
        lines = []
        demo_boxes = []
        for pred in preds:
            score = pred["detection_score"]
            name = pred["detection_name"]
            if score <= score_threshold or name not in CATEGORY_MAP:
                continue
            w, l, h = pred["size"]
            x, y, z = pred["translation"]
            yaw_lidar = pred["box_yaw"]
            bottom_center = [x, y, z]
            center_in_cam = r_velo2cam @ np.asarray(
                bottom_center, np.float64) + t_velo2cam[:, 0]
            alpha, _ = camera_alpha_yaw([l, w, h], yaw_lidar, bottom_center,
                                        center_in_cam, r_velo2cam, t_velo2cam)
            yaw = 0.5 * np.pi - yaw_lidar
            cam_xyz = (velo2cam @ np.array([x, y, z, 1.0]))[:3]
            # Reference passes [x, y, z + h/2] to a helper that subtracts h/2
            # (result2kitti.py:242 + :23) — net: corners based at bottom z.
            # Note the [w, l, h] order here is the reference's own quirk.
            corners = lidar_corners([w, l, h], yaw_lidar, [x, y, z])
            box2d = project_box2d(corners, velo2cam, intrinsic34)
            demo_boxes.append(corners)
            lines.append([
                CATEGORY_MAP[name], "0", "0", str(round(alpha, 4)),
                str(round(box2d[0], 4)), str(round(box2d[1], 4)),
                str(round(box2d[2], 4)), str(round(box2d[3], 4)),
                # reference column order: h, l, w (result2kitti.py:255-258)
                str(round(h, 4)), str(round(l, 4)), str(round(w, 4)),
                str(round(float(cam_xyz[0]), 4)),
                str(round(float(cam_xyz[1]), 4)),
                str(round(float(cam_xyz[2]), 4)),
                str(round(yaw, 4)), str(round(float(score), 4)),
            ])
        with open(os.path.join(out_dir, f"{sample_id:06d}.txt"), "w") as f:
            for line in lines:
                f.write(" ".join(line) + "\n")
        if demo:
            from sgv3d_tpu.evalkit.vis import pcd_vis

            label_path = (os.path.join(gt_label_dir, f"{sample_id:06d}.txt")
                          if gt_label_dir else None)
            points = None
            if pcd_dir:
                bin_path = os.path.join(pcd_dir, f"{sample_id:06d}.bin")
                if os.path.exists(bin_path):
                    points = np.fromfile(
                        bin_path, dtype=np.float32).reshape(-1, 4)[:, :3]
            pcd_vis(demo_boxes,
                    os.path.join(results_path, "demo", f"{sample_id:06d}.jpg"),
                    label_path, velo2cam, points=points)
    return out_dir
