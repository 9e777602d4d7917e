"""Image transforms for the data pipeline (host-side, numpy + PIL).

Parity targets in /root/reference/dataset/nusc_mv_det_dataset.py:
  img_intrin_extrin_transform (:94-110)  — rectify aug (resize about the
    principal point, roll rotate, pitch translate)
  img_transform (:133-161)               — ida resize/crop (+ matrix)
  brightness aug (:618-623)              — 30% gray-level shift
  imnormalize (:624)                     — mmcv semantics INCLUDING the
    channel-reversal quirk: images are loaded as RGB by PIL but normalised
    with to_rgb=True which flips channel order again; replicated faithfully.
  intrin/extrin sampling (:400-431)      — focal ratio / roll / pitch
"""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
from PIL import Image

from sgv3d_tpu import geom

RESAMPLE_LANCZOS = Image.LANCZOS  # PIL's ANTIALIAS alias (removed in Pillow 10)


def img_intrin_extrin_transform(img: Image.Image, ratio: float, roll: float,
                                transform_pitch: int,
                                intrin_mat: np.ndarray) -> Image.Image:
    """Scale about the principal point, then rotate by -roll and translate by
    the pitch-induced principal-point shift."""
    center = intrin_mat[:2, 2].astype(np.int32)
    center = (int(center[0]), int(center[1]))
    w, h = img.size
    new_w, new_h = int(w * ratio), int(h * ratio)
    img = img.resize((new_w, new_h), RESAMPLE_LANCZOS)
    h_min = int(center[1] * abs(1.0 - ratio))
    w_min = int(center[0] * abs(1.0 - ratio))
    if ratio <= 1.0:
        image = Image.new(mode="RGB", size=(w, h))
        image.paste(img, (w_min, h_min, w_min + new_w, h_min + new_h))
    else:
        image = img.crop((w_min, h_min, w_min + w, h_min + h))
    return image.rotate(-roll, expand=0, center=center,
                        translate=(0, transform_pitch), fillcolor=(0, 0, 0),
                        resample=Image.BICUBIC)


def img_transform(img: Image.Image, resize: float,
                  resize_dims: Tuple[int, int], crop, flip: bool,
                  rotate: float):
    """Resize/crop/flip/rotate + the matching 4x4 ida matrix."""
    img = img.resize(resize_dims)
    img = img.crop(crop)
    if flip:
        img = img.transpose(method=Image.FLIP_LEFT_RIGHT)
    img = img.rotate(rotate)
    ida_mat = geom.ida_matrix(resize, crop, flip, rotate)
    return img, ida_mat


def sample_ida_augmentation(ida_aug_conf: dict):
    """Deterministic resize/crop (no flip/rotate), as the reference (:433-446)."""
    H, W = ida_aug_conf["H"], ida_aug_conf["W"]
    fH, fW = ida_aug_conf["final_dim"]
    resize = max(fH / H, fW / W)
    resize_dims = (int(W * resize), int(H * resize))
    new_w, new_h = resize_dims
    crop_h = int((1 - np.mean(ida_aug_conf["bot_pct_lim"])) * new_h) - fH
    crop_w = int(max(0, new_w - fW) / 2)
    crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
    return resize, resize_dims, crop, False, 0


def sample_intrin_extrin_augmentation(rng: np.random.Generator,
                                      intrin_mat: np.ndarray,
                                      ego2sensor: np.ndarray,
                                      ratio_std=0.20, roll_std=2.0,
                                      pitch_std=0.67):
    """Randomly rectify intrinsics (focal ratio) and extrinsics (roll, pitch);
    returns (intrin', ego2sensor', ratio, roll, transform_pitch)."""
    ratio = rng.normal(1.0, ratio_std)
    intrin = intrin_mat.copy()
    intrin[:2, :2] = intrin_mat[:2, :2] * ratio

    roll = rng.normal(0.0, roll_std)
    r = math.radians(roll)
    rect_roll = np.eye(4)
    rect_roll[:2, :2] = [[math.cos(r), -math.sin(r)],
                         [math.sin(r), math.cos(r)]]
    after_roll = rect_roll @ ego2sensor

    pitch = rng.normal(0.0, pitch_std)
    p = math.radians(pitch)
    rect_pitch = np.eye(4)
    rect_pitch[1:3, 1:3] = [[math.cos(p), -math.sin(p)],
                            [math.sin(p), math.cos(p)]]
    after_pitch = rect_pitch @ after_roll

    # principal-point shift induced by the pitch rectification
    K = intrin[:3, :3]
    M = (K @ after_pitch[:3, :3]) @ np.linalg.inv(
        after_roll[:3, :3]) @ np.linalg.inv(K)
    center = intrin[:2, 2]
    center_ref = M @ np.array([center[0], center[1], 1.0])
    transform_pitch = int(center_ref[1] - center[1])
    return (intrin.astype(np.float32), after_pitch.astype(np.float32),
            ratio, roll, transform_pitch)


def brightness_augment(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """30%-probability gray-level shift toward brightness 100 (+-50 cap),
    reference :618-623. Two cv2 semantics replicated exactly (verified by
    tests/data_oracle.py): cvtColor BGR2GRAY fixed-point gray on the
    RGB-loaded array (the channel-swap quirk is part of the protocol), and
    convertScaleAbs = |img + beta| rounded half-to-even then saturated at
    255 — NOT clipped at 0: negative results reflect."""
    gray = ((img[..., 2].astype(np.int64) * 4899
             + img[..., 1].astype(np.int64) * 9617
             + img[..., 0].astype(np.int64) * 1868 + (1 << 13)) >> 14)
    beta = rng.random() * (100 - gray.mean())
    beta = (1 if beta > 0 else -1) * min(abs(beta), 50)
    out = np.rint(np.abs(img.astype(np.float64) + beta))
    return np.minimum(out, 255).astype(np.uint8)


def imnormalize(img: np.ndarray, mean: np.ndarray, std: np.ndarray,
                to_rgb: bool = True) -> np.ndarray:
    """mmcv.imnormalize semantics: optional channel reversal, then
    (img - mean) / std in float32."""
    img = img.astype(np.float32)
    if to_rgb:
        img = img[..., ::-1]
    return (img - mean.astype(np.float32)) / std.astype(np.float32)


class ResizeLongestSide:
    """SAM-style longest-side resize for images/coords/boxes
    (/root/reference/dataset/transforms.py:16-102)."""

    def __init__(self, target_length: int):
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(oldh: int, oldw: int, long_side: int):
        scale = long_side * 1.0 / max(oldh, oldw)
        newh, neww = oldh * scale, oldw * scale
        return int(newh + 0.5), int(neww + 0.5)

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        h, w = image.shape[:2]
        newh, neww = self.get_preprocess_shape(h, w, self.target_length)
        pil = Image.fromarray(image)
        return np.array(pil.resize((neww, newh), Image.BILINEAR))

    def apply_coords(self, coords: np.ndarray, original_size) -> np.ndarray:
        old_h, old_w = original_size
        new_h, new_w = self.get_preprocess_shape(old_h, old_w,
                                                 self.target_length)
        coords = coords.astype(np.float64).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords

    def apply_boxes(self, boxes: np.ndarray, original_size) -> np.ndarray:
        boxes = self.apply_coords(boxes.reshape(-1, 2, 2), original_size)
        return boxes.reshape(-1, 4)
