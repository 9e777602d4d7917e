#!/usr/bin/env python
"""Dataset sanity check: draw GT 3D boxes on the image + a BEV map.

Equivalent of the reference's scripts/data_converter/visual_tools.py (image
wireframes) and evaluators/utils.py BEV renderings, using PIL.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image  # noqa: E402

from sgv3d_tpu.data.dataset import RoadSideDataset, load_infos, quat_to_rot  # noqa: E402
from sgv3d_tpu.evalkit.vis import (  # noqa: E402
    BEVCanvas, box_bev_corners, draw_boxes_on_image)


def ego_box_corners(box9):
    """(9,) ego box -> (8, 3) corners (gravity-centred z)."""
    x, y, z, dx, dy, dz, yaw = box9[:7]
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    local = np.array([[sx * dx / 2, sy * dy / 2, sz * dz / 2]
                      for sz in (-1, 1) for sy in (-1, 1) for sx in (-1, 1)])
    order = [0, 1, 3, 2, 4, 5, 7, 6]
    return (local[order] @ R.T) + np.array([x, y, z])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--info", required=True, help="info pkl name in data root")
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--out", default="vis.jpg")
    args = p.parse_args()

    infos = load_infos(os.path.join(args.data_root, args.info))
    info = infos[args.index]
    cam = info["cam_infos"]["CAM_FRONT"]
    img = np.array(Image.open(os.path.join(args.data_root, cam["filename"])
                              ).convert("RGB"))

    sensor2ego = np.eye(4)
    cs = cam["calibrated_sensor"]
    sensor2ego[:3, :3] = np.asarray(cs["rotation_matrix"]) \
        if "rotation_matrix" in cs else quat_to_rot(cs["rotation"])
    sensor2ego[:3, 3] = np.asarray(cs["translation"])
    ego2cam = np.linalg.inv(sensor2ego)
    K = np.asarray(cs["camera_intrinsic"])

    ds = RoadSideDataset(
        {"final_dim": (img.shape[0], img.shape[1]), "H": img.shape[0],
         "W": img.shape[1], "bot_pct_lim": (0.0, 0.0), "cams": ["CAM_FRONT"],
         "Ncams": 1},
        ("car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
         "motorcycle", "bicycle", "pedestrian", "traffic_cone"),
        args.data_root, os.path.join(args.data_root, args.info),
        is_train=False)
    boxes, labels = ds.get_gt(info)
    valid = labels >= 0
    boxes = boxes[valid]

    wireframes = []
    canvas = BEVCanvas()
    for b in boxes:
        corners = ego_box_corners(b)
        cam_pts = (ego2cam @ np.concatenate(
            [corners, np.ones((8, 1))], axis=1).T)[:3].T
        if (cam_pts[:, 2] <= 0.1).any():
            continue
        uv = (K @ cam_pts.T)
        uv = (uv[:2] / uv[2]).T
        wireframes.append(uv)
        canvas.draw_box(box_bev_corners(b[0], b[1], b[3], b[4], b[6]))
    out_img = draw_boxes_on_image(img, wireframes)
    Image.fromarray(out_img).save(args.out)
    bev_path = os.path.splitext(args.out)[0] + "_bev.jpg"
    canvas.save(bev_path)
    print(f"wrote {args.out} ({len(wireframes)} boxes) and {bev_path}")


if __name__ == "__main__":
    main()
