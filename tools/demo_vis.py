#!/usr/bin/env python
"""Render BEV demo images (predictions vs GT over the lidar point cloud)
from a KITTI-format dataset tree + a results_nusc.json.

Equivalent of the reference's `result2kitti(..., demo=True)` mode
(/root/reference/evaluators/result2kitti.py:212-267 + pcd_vis :126-155):

  python tools/demo_vis.py --results outputs/<exp>/results_nusc.json \
      --data_root data/rope3d-kitti --out outputs/<exp>/demo_run \
      [--pcd_dir data/rope3d-kitti/training/velodyne] \
      [--gt_label_dir data/rope3d-kitti/training/label_eval] \
      [--score_threshold 0.45]

Writes `<out>/data/<id>.txt` KITTI labels and `<out>/demo/<id>.jpg` images.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True,
                    help="results_nusc.json (evaluator artifact)")
    ap.add_argument("--data_root", required=True,
                    help="kitti-format dataset root (training/calib/...)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gt_label_dir", default=None,
                    help="GT label dir to overlay in red "
                         "(default: <data_root>/training/label_eval or "
                         "label_2 if present)")
    ap.add_argument("--pcd_dir", default=None,
                    help="dir of <id>.bin lidar files rendered as background")
    ap.add_argument("--score_threshold", type=float, default=0.45)
    args = ap.parse_args()

    from sgv3d_tpu.evalkit.kitti_writer import kitti_root_calib, result2kitti

    with open(args.results) as f:
        results = json.load(f)
    results = results.get("results", results)

    gt_dir = args.gt_label_dir
    if gt_dir is None:
        for cand in ("training/label_eval", "training/label_2"):
            p = os.path.join(args.data_root, cand)
            if os.path.isdir(p):
                gt_dir = p
                break

    out_dir = result2kitti(
        results, args.out, kitti_root_calib(args.data_root),
        score_threshold=args.score_threshold, demo=True,
        gt_label_dir=gt_dir, pcd_dir=args.pcd_dir)
    demo_dir = os.path.join(args.out, "demo")
    os.makedirs(demo_dir, exist_ok=True)  # zero-frame results never mkdir it
    n = len(os.listdir(demo_dir))
    print(f"wrote {n} demo images to {demo_dir} (labels in {out_dir})")


if __name__ == "__main__":
    main()
