"""SSDG (Semi-Supervised Data Generation) core utilities.

Parity targets: /root/reference/scripts/data_preprocess/recombine_utils.py —
homography re-rendering between cameras (get_M :32-38, bilinear warp
:135-170), ego-frame annotation machinery (compute_box_3d_camera_v2 :406-430,
annos_cam2ego :432-450), cross-camera unification (:526-549), brightness-
matched IoU-gated cut-paste composition (:628-687), and the KITTI writers
(:717-808) including the class2id semantic encoding {car:6 ... cyclist:1}
and the x40 mask .npy format.

Numpy/PIL only; the SAM predictor is injected (see masks.py).
"""
from __future__ import annotations

import math
import os
import random

import numpy as np

CLS_FOCUS = ("car", "van", "truck", "bus", "pedestrian", "cyclist")
CLASS2ID = {"car": 6, "van": 5, "bus": 4, "truck": 3, "pedestrian": 2,
            "cyclist": 1, "bicycle": 1, "tricyclist": 1, "motorcycle": 1,
            "motorcyclist": 1}
KNOWN_NAMES = ("car", "bus", "van", "truck", "pedestrian", "cyclist",
               "bicycle", "tricyclist", "motorcycle", "motorcyclist")

LABEL_FIELDS = ("type", "truncated", "occluded", "alpha", "xmin", "ymin",
                "xmax", "ymax", "dh", "dw", "dl", "lx", "ly", "lz", "ry")


def rodrigues(axis_angle):
    from sgv3d_tpu.geom import rodrigues as _r
    return _r(np.asarray(axis_angle, np.float64))


# ---------------------------------------------------------------------------
# calibration / geometry parsing
# ---------------------------------------------------------------------------

def equation_plane(points):
    p1, p2, p3 = points[0, :3], points[1, :3], points[2, :3]
    n = np.cross(p2 - p1, p3 - p1)
    return np.array([n[0], n[1], n[2], -np.dot(n, p1)])


def get_denorm(Tr_ego2cam):
    g = np.array([[0.0, 0, 0, 1], [0, 1.0, 0, 1], [1.0, 1.0, 0, 1]])
    cam = (np.asarray(Tr_ego2cam) @ g.T).T
    return -1 * equation_plane(cam)


def parse_roll_pitch(Tr_ego2cam):
    g = np.array([[0.0, 0, 0, 1], [0, 1.0, 0, 1], [1.0, 1.0, 0, 1]])
    cam = (np.asarray(Tr_ego2cam) @ g.T).T
    denorm = equation_plane(cam)
    origin = np.array([0, 1.0, 0])
    xy = np.array([denorm[0], denorm[1], 0.0])
    yz = np.array([0.0, denorm[1], denorm[2]])
    xy = xy / np.linalg.norm(xy)
    yz = yz / np.linalg.norm(yz)
    roll = math.degrees(math.acos(np.clip(np.inner(origin, xy), -1, 1)))
    pitch = math.degrees(math.acos(np.clip(np.inner(origin, yz), -1, 1)))
    roll = -roll if xy[0] > 0 else roll
    pitch = -pitch if yz[1] > 0 else pitch
    return roll, pitch


def parse_height_from_denorm(denorm):
    return round(float(abs(denorm[3]) / np.linalg.norm(denorm[:3])), 6)


def parse_height_from_Tr(Tr_ego2cam):
    denorm = get_denorm(Tr_ego2cam)
    return parse_height_from_denorm(denorm), denorm


def get_cam2ego(denorm):
    """denorm -> Tr_cam2ego (Rz @ Rx @ rodrigues, translation (0, 0, h))."""
    Rx = np.array([[1.0, 0, 0], [0, 0, 1.0], [0, -1.0, 0]])
    Rz = np.array([[0, 1.0, 0], [-1.0, 0, 0], [0, 0, 1.0]])
    origin = np.array([0, 1.0, 0])
    target = -1 * np.asarray(denorm[:3], np.float64)
    target = target / np.linalg.norm(target)
    theta = math.acos(float(np.clip(np.inner(target, origin), -1, 1)))
    n = np.cross(target, origin)
    n = n / np.linalg.norm(n)
    cam2ego = Rz @ (Rx @ rodrigues(n * theta))
    d = abs(denorm[3]) / np.linalg.norm(denorm[:3])
    Tr = np.eye(4)
    Tr[:3, :3] = cam2ego
    Tr[:3, 3] = [0, 0, d]
    return Tr


def load_calib_v2(calib_file):
    """KITTI calib -> (Tr_ego2cam 4x4, P2 3x4)."""
    P2 = tr = None
    with open(calib_file) as f:
        for line in f:
            parts = line.strip().split(" ")
            if parts[0] == "P2:":
                P2 = np.array(parts[1:13], np.float64).reshape(3, 4)
            elif parts[0] == "Tr_velo_to_cam:":
                tr = np.array(parts[1:13], np.float64).reshape(3, 4)
    Tr = np.eye(4)
    Tr[:3] = tr
    return Tr, P2


# ---------------------------------------------------------------------------
# annotations
# ---------------------------------------------------------------------------

def load_annos(label_path, is_pred=False, score_threshold=0.70):
    annos = []
    with open(label_path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 15:
                continue
            row = dict(zip(LABEL_FIELDS + (("score",) if is_pred else ()),
                           parts))
            loc = np.array([float(row["lx"]), float(row["ly"]),
                            float(row["lz"])], np.float32)
            if np.linalg.norm(loc) > 140:
                continue
            if row["type"].lower() not in KNOWN_NAMES:
                continue
            dim = [float(row["dh"]), float(row["dw"]), float(row["dl"])]
            if sum(dim) == 0:
                continue
            score = float(row.get("score", 1.0)) if is_pred else 1.0
            if score < score_threshold:
                continue
            annos.append({
                "dim": dim, "loc": loc, "rotation": float(row["ry"]),
                "name": row["type"],
                "box2d": [float(row["xmin"]), float(row["ymin"]),
                          float(row["xmax"]), float(row["ymax"])],
                "truncated_state": float(row["truncated"]),
                "occluded_state": float(row["occluded"]),
                "alpha": float(row["alpha"]), "score": score,
            })
    return annos


def compute_box_3d_camera_v2(dim, location, rotation_y, denorm):
    """Camera-frame corners of a ground-aligned box (dim = (h, w, l))."""
    c, s = np.cos(rotation_y), np.sin(rotation_y)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
    l, w, h = dim[2], dim[1], dim[0]
    x = [l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2]
    y = [0, 0, 0, 0, -h, -h, -h, -h]
    z = [w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2]
    corners = R @ np.array([x, y, z], np.float64)
    dn = np.asarray(denorm[:3], np.float64)
    dn_norm = dn / np.linalg.norm(dn)
    ori = np.array([0.0, -1.0, 0.0])
    theta = -1 * math.acos(float(np.clip(np.dot(dn_norm, ori), -1, 1)))
    n = np.cross(dn, ori)
    n = n / np.linalg.norm(n)
    corners = rodrigues(theta * n) @ corners
    return (corners + np.asarray(location, np.float64)[:, None]).T


def annos_cam2ego(annos, Tr_cam2ego, denorm):
    out = []
    for a in annos:
        corners = compute_box_3d_camera_v2(a["dim"], a["loc"], a["rotation"],
                                           denorm).T
        corners = np.concatenate(
            [corners, np.ones((1, corners.shape[1]))], axis=0)
        corners_ego = (Tr_cam2ego @ corners)[:3]
        loc = np.mean(corners_ego, axis=-1)
        dx = corners_ego[0, 0] - corners_ego[0, 3]
        dy = corners_ego[1, 0] - corners_ego[1, 3]
        out.append({**a, "loc": loc, "rotation": math.atan2(dy, dx),
                    "corners_3d": corners_ego})
    return out


def project_to_image(pts_3d, P):
    """(N, 3) camera-frame points -> (N, 2) pixels through 3x4 (or 3x3) P."""
    P = np.asarray(P, np.float64)
    if P.shape == (3, 3):
        P = np.concatenate([P, np.zeros((3, 1))], axis=1)
    homog = np.concatenate([pts_3d, np.ones((pts_3d.shape[0], 1))], axis=1)
    uv = (P @ homog.T).T
    return uv[:, :2] / uv[:, 2:3]


def iou_xyxy(boxes, query):
    """(N, 4) vs (1, 4) -> (N, 1) IoU."""
    boxes = np.asarray(boxes, np.float64)
    query = np.asarray(query, np.float64)
    x1 = np.maximum(boxes[:, 0:1], query[:, 0])
    y1 = np.maximum(boxes[:, 1:2], query[:, 1])
    x2 = np.minimum(boxes[:, 2:3], query[:, 2])
    y2 = np.minimum(boxes[:, 3:4], query[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    a2 = (query[:, 2] - query[:, 0]) * (query[:, 3] - query[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


# ---------------------------------------------------------------------------
# homography re-rendering between cameras
# ---------------------------------------------------------------------------

def get_M(R, K, R_r, K_r):
    return K_r @ R_r @ np.linalg.inv(R) @ np.linalg.inv(K)


def transform_with_M_bilinear(image, M):
    """Warp image by homography M (vectorised numpy port of the reference's
    per-pixel bilinear resample; out-of-bounds pixels zeroed)."""
    h, w = image.shape[:2]
    xu, yv = np.meshgrid(np.arange(w), np.arange(h))
    uvd = np.stack([xu, yv, np.ones_like(xu)], axis=-1).astype(np.float64) * 10
    uvd = uvd.reshape(-1, 3)
    Minv = np.linalg.inv(M)
    uvd_new = (Minv @ uvd.T).T
    uv_new = uvd_new[:, :2] / uvd_new[:, 2:3]
    mask_uv = uv_new.reshape(h, w, 2)
    uv = uv_new.copy()
    uv[:, 0] = np.clip(uv[:, 0], 0, w - 2)
    uv[:, 1] = np.clip(uv[:, 1], 0, h - 2)
    uv = uv.reshape(h, w, 2)
    cx, cy = uv[..., 1], uv[..., 0]  # (row, col) float coords
    x0 = np.floor(cx).astype(np.int32)
    y0 = np.floor(cy).astype(np.int32)
    fx = (cx - x0)[..., None]
    fy = (cy - y0)[..., None]
    img = image if image.ndim == 3 else image[..., None]
    f1 = (1 - fy) * img[x0, y0] + fy * img[x0, y0 + 1]
    f2 = (1 - fy) * img[x0 + 1, y0] + fy * img[x0 + 1, y0 + 1]
    out = (1 - fx) * f1 + fx * f2
    bad = ((mask_uv[..., 0] < 0) | (mask_uv[..., 0] > w - 2)
           | (mask_uv[..., 1] < 0) | (mask_uv[..., 1] > h - 2))
    out[bad] = 0
    out = out.astype(np.float32)
    return out if image.ndim == 3 else out[..., 0]


# ---------------------------------------------------------------------------
# sample processing / composition
# ---------------------------------------------------------------------------

def load_image_bgr(path):
    from PIL import Image
    img = np.array(Image.open(path).convert("RGB"))
    return img[:, :, ::-1].copy()  # BGR like cv2.imread, as reference


def save_image_bgr(path, img):
    from PIL import Image
    Image.fromarray(np.clip(img[:, :, ::-1], 0, 255).astype(np.uint8)
                    ).save(path)


def load_sample(data_root, subset, frame_id, is_pred=False):
    calib_file = os.path.join(data_root, subset, "calib", frame_id + ".txt")
    img_file = os.path.join(data_root, subset, "image_2", frame_id + ".jpg")
    if not os.path.exists(img_file):
        img_file = img_file.replace(".jpg", ".png")
    img = load_image_bgr(img_file)
    Tr_ego2cam, P2 = load_calib_v2(calib_file)
    height, _ = parse_height_from_Tr(Tr_ego2cam)
    label_path = os.path.join(data_root, subset, "label_2", frame_id + ".txt")
    annos_cam = load_annos(label_path, is_pred=is_pred)
    denorm = get_denorm(Tr_ego2cam)
    annos_ego = annos_cam2ego(annos_cam, np.linalg.inv(Tr_ego2cam), denorm)
    return {"img": img, "Tr_ego2cam": Tr_ego2cam, "P2": P2, "denorm": denorm,
            "annos_ego": annos_ego, "frame_id": frame_id, "split": subset,
            "height": height, "mask_image": None}


def update_bbox_info(sample_info):
    Tr, P2 = sample_info["Tr_ego2cam"], sample_info["P2"]
    kept = []
    for anno in sample_info["annos_ego"]:
        corners = anno["corners_3d"]
        corners = np.concatenate(
            [corners, np.ones((1, corners.shape[1]))], axis=0)
        cam = (Tr @ corners).T[:, :3]
        uv = project_to_image(cam, P2)
        xmin, ymin = float(uv[:, 0].min()), float(uv[:, 1].min())
        xmax, ymax = float(uv[:, 0].max()), float(uv[:, 1].max())
        if xmax <= 0 or ymax <= 0:
            continue
        anno["bbox"] = [max(0, xmin), max(0, ymin), xmax, ymax]
        kept.append(anno)
    sample_info["annos_ego"] = kept
    return sample_info


def unify_extrinsic_params(sample_info, sample_info_dest):
    """Re-render a source frame into the destination camera: homography warp
    of the image + translation of 3D annos by the camera-position delta."""
    img = sample_info["img"]
    Tr, P2 = sample_info["Tr_ego2cam"], sample_info["P2"]
    Tr_d, P2_d = sample_info_dest["Tr_ego2cam"], sample_info_dest["P2"]
    M = get_M(Tr[:3, :3], np.asarray(P2)[:3, :3],
              Tr_d[:3, :3], np.asarray(P2_d)[:3, :3])
    img = transform_with_M_bilinear(img, M)
    denorm = get_denorm(Tr_d)
    delta = np.linalg.inv(Tr_d)[:3, 3] - np.linalg.inv(Tr)[:3, 3]
    annos = sample_info["annos_ego"]
    for a in annos:
        a["corners_3d"] = a["corners_3d"] + delta[:, None]
        a["loc"] = a["loc"] + delta
    return {"img": img, "Tr_ego2cam": Tr_d, "P2": P2_d, "denorm": denorm,
            "annos_ego": annos, "mask_image": None}


def objects_combine(mask_predictor, sample_info_list, sample_info_dest,
                    sample_ratio, rng=random):
    """Brightness-match each source, reject objects overlapping existing ones
    (IoU >= 0.15), cut-paste masked pixels + semantic ids into the dest."""
    sample_info_dest = update_bbox_info(sample_info_dest)
    img_dest = sample_info_dest["img"].astype(np.float64)
    annos_dest = sample_info_dest["annos_ego"]
    if annos_dest:
        init_bboxes = np.array([a["bbox"] for a in annos_dest])
        labels = [CLASS2ID[a["name"].lower()] for a in annos_dest]
    else:
        init_bboxes = np.array([[0, 0, 0, 0]])
        labels = [0]
    mask_dest = mask_predictor(img_dest, init_bboxes, labels)

    def gray(img):
        return (img[..., 2] * 0.299 + img[..., 1] * 0.587
                + img[..., 0] * 0.114)

    Tr, P2, denorm = (sample_info_dest["Tr_ego2cam"], sample_info_dest["P2"],
                      sample_info_dest["denorm"])
    for sample_info in sample_info_list:
        img = sample_info["img"].astype(np.float64)
        Tr, P2, denorm = (sample_info["Tr_ego2cam"], sample_info["P2"],
                          sample_info["denorm"])
        beta = 100 * (gray(img_dest).mean() - gray(img).mean()) / max(
            gray(img).mean(), 1e-6)
        beta = (1 if beta > 0 else -1) * min(abs(beta), 60)
        img = np.clip(img + beta, 0, 255)

        selected = [a for a in sample_info["annos_ego"]
                    if a["name"].lower() in CLS_FOCUS]
        chosen = rng.sample(selected, int(sample_ratio * len(selected)))
        prompts, prompt_labels = [], []
        for anno in chosen:
            b = np.asarray(anno["bbox"], np.float64)
            xmin, ymin = max(0, b[0]), max(0, b[1])
            xmax = min(b[2], img.shape[1] - 1)
            ymax = min(b[3], img.shape[0] - 1)
            if xmax <= xmin or ymax <= ymin or xmax - xmin <= 1 \
                    or ymax - ymin <= 1:
                continue
            bbox = np.array([xmin, ymin, xmax, ymax])
            if np.max(iou_xyxy(init_bboxes, bbox[None])) < 0.15:
                init_bboxes = np.vstack([init_bboxes, bbox[None]])
                annos_dest.append(anno)
                prompts.append(bbox)
                prompt_labels.append(CLASS2ID[anno["name"].lower()])
        mask_src = mask_predictor(img, np.array(prompts), prompt_labels)
        binary = (mask_src > 0).astype(np.float64)
        img_dest = img_dest * (1 - binary) + img * binary
        mask_dest = np.clip(mask_dest * (1 - binary) + mask_src * binary,
                            0, 6)
    return {"Tr_ego2cam": Tr, "P2": P2, "denorm": denorm,
            "img": img_dest.astype(np.float32), "annos_ego": annos_dest,
            "mask_image": mask_dest.astype(np.uint8)}


def frame_combine(mask_predictor, data_root, frame_id_list, frame_id_dest,
                  cnt, sample_ratio=1.0, is_pred=False, rng=random):
    dest = load_sample(data_root, "training", frame_id_dest)
    srcs = []
    for fid in frame_id_list:
        s = load_sample(data_root, "training", fid, is_pred)
        s = unify_extrinsic_params(s, dest)
        srcs.append(update_bbox_info(s))
    combined = objects_combine(mask_predictor, srcs, dest, sample_ratio, rng)
    combined["frame_id"] = f"{cnt:06d}"
    combined["split"] = "training"
    return combined


# ---------------------------------------------------------------------------
# KITTI writers for generated samples
# ---------------------------------------------------------------------------

def normalize_angle(angle):
    a = np.arctan(np.tan(angle))
    if np.cos(angle) < 0:
        a = a + math.pi
    return a


def label_generation(Tr_ego2cam, annos_ego, label_path):
    lines = []
    for anno in annos_ego:
        score = anno.get("score", 1.0)
        h, w, l = anno["dim"][0], anno["dim"][1], anno["dim"][2]
        corners = anno["corners_3d"]
        corners = np.concatenate(
            [corners, np.ones((1, corners.shape[1]))], axis=0)
        cam = (Tr_ego2cam @ corners).T[:, :3]
        loc = np.mean(cam, axis=0)
        loc[1] += h / 2
        dx = cam[0, 0] - cam[3, 0]
        dz = cam[0, 2] - cam[3, 2]
        rotation = math.atan2(-dz, dx)
        alpha = rotation - math.atan2(loc[0], loc[2])
        if alpha > math.pi:
            alpha -= 2 * math.pi
        if alpha <= -math.pi:
            alpha += 2 * math.pi
        alpha = normalize_angle(alpha)
        bbox = anno["bbox"]
        lines.append(" ".join([
            anno["name"], str(anno["truncated_state"]),
            str(anno["occluded_state"]), str(round(alpha, 4)),
            str(round(bbox[0], 4)), str(round(bbox[1], 4)),
            str(round(bbox[2], 4)), str(round(bbox[3], 4)),
            str(round(h, 4)), str(round(w, 4)), str(round(l, 4)),
            str(round(float(loc[0]), 4)), str(round(float(loc[1]), 4)),
            str(round(float(loc[2]), 4)), str(round(rotation, 4)),
            str(round(score, 4))]))
    with open(label_path, "w") as f:
        for line in lines:
            f.write(line + "\n")


def save_kitti_format(data_root, sample_info, img_path):
    for sub in ("training/denorm", "training/calib", "training/label_2",
                "training/mask_image", img_path):
        os.makedirs(os.path.join(data_root, sub), exist_ok=True)
    fid = sample_info["frame_id"]
    if sample_info.get("mask_image") is not None:
        mask = sample_info["mask_image"]
        if mask.ndim == 2:
            mask = mask[:, :, None]
        mask3 = np.repeat(mask, 3, axis=2) * 40
        np.save(os.path.join(data_root, "training/mask_image", fid + ".npy"),
                mask3.astype(np.uint8))
    save_image_bgr(os.path.join(data_root, img_path, fid + ".jpg"),
                   sample_info["img"])
    Tr, P2 = sample_info["Tr_ego2cam"], np.asarray(sample_info["P2"])
    if P2.shape == (3, 3):
        P2 = np.concatenate([P2, np.zeros((3, 1))], axis=1)
    with open(os.path.join(data_root, "training/calib", fid + ".txt"),
              "w") as f:
        for key, val in (("P0", np.zeros((3, 4))), ("P1", np.zeros((3, 4))),
                         ("P2", P2), ("Tr_velo_to_cam", Tr[:3, :4])):
            f.write(key + ": " + " ".join(
                "%.12e" % v for v in np.asarray(val).flatten()) + "\n")
    with open(os.path.join(data_root, "training/denorm", fid + ".txt"),
              "w") as f:
        f.write(" ".join(str(v) for v in sample_info["denorm"]) + "\n")
    label_generation(Tr, sample_info["annos_ego"],
                     os.path.join(data_root, "training/label_2", fid + ".txt"))
