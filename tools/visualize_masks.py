#!/usr/bin/env python
"""Overlay cached SSDG semantic masks on images (sanity check).

Equivalent of the reference's scripts/data_preprocess/visual_mask.py /
sam_utils.py demos, using PIL.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

CLASS_COLORS = {
    1: (255, 200, 0),    # cyclist-like
    2: (255, 0, 255),    # pedestrian
    3: (0, 200, 255),    # truck
    4: (0, 255, 255),    # bus
    5: (255, 255, 0),    # van
    6: (0, 255, 0),      # car
}


def overlay(img: np.ndarray, mask_ids: np.ndarray, alpha=0.5) -> np.ndarray:
    out = img.astype(np.float64)
    for cid, color in CLASS_COLORS.items():
        m = mask_ids == cid
        out[m] = (1 - alpha) * out[m] + alpha * np.array(color)
    return out.astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--frame", required=True, help="6-digit frame id")
    p.add_argument("--out", default="mask_vis.jpg")
    args = p.parse_args()
    img = np.array(Image.open(os.path.join(
        args.data_root, "training/image_2", args.frame + ".jpg")))
    mask = np.load(os.path.join(
        args.data_root, "training/mask_image", args.frame + ".npy"))
    ids = (mask[:, :, 0] / 40).astype(np.uint8) if mask.ndim == 3 else mask
    Image.fromarray(overlay(img, ids)).save(args.out)
    classes, counts = np.unique(ids[ids > 0], return_counts=True)
    print(f"wrote {args.out}; classes {dict(zip(classes.tolist(), counts.tolist()))}")


if __name__ == "__main__":
    main()
