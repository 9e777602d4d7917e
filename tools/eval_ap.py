#!/usr/bin/env python
"""Standalone KITTI R40 AP evaluation over two label directories.

Equivalent of the reference's kitti_evaluation entry
(/root/reference/evaluators/result2kitti.py:62-72 and the det_evaluators
__main__ block).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgv3d_tpu.evalkit import kitti_evaluation  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pred", required=True, help="predicted label dir")
    p.add_argument("--gt", required=True, help="ground-truth label dir")
    p.add_argument("--classes", nargs="+",
                   default=["Car", "Pedestrian", "Cyclist"])
    p.add_argument("--metric-path", default="outputs/metrics")
    a = p.parse_args()
    mAP, _ = kitti_evaluation(a.pred, a.gt, current_classes=a.classes,
                              metric_path=a.metric_path)
    print(f"Car_3D_moderate_strict: {mAP:.2f}")
