#!/usr/bin/env python
"""CLI: SSDG recombination pipeline
(reference: /root/reference/scripts/data_preprocess/recombine_strategy.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ssdg.recombine import run_ssdg  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src-root", default="data/rope3d-kitti")
    p.add_argument("--dest-root", default="data/rope3d-kitti-gen")
    p.add_argument("--sam-checkpoint", default=None,
                   help="path to SAM ViT-H weights; omit for box-fill masks")
    p.add_argument("--pred-root", default=None,
                   help="root with teacher pseudo-labels (enables stage 6)")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    run_ssdg(a.src_root, a.dest_root, sam_checkpoint=a.sam_checkpoint,
             pred_root=a.pred_root, seed=a.seed)
