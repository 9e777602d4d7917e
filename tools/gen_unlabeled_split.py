#!/usr/bin/env python
"""CLI: pick Rope3D frames with focal lengths unseen in DAIR train/val scenes
(reference: /root/reference/scripts/data_preprocess/gen_unlabeled_split.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.rope3d import gen_unlabeled_split  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src-root", default="data/rope3d-kitti")
    p.add_argument("--split-root", default="data/rope3d-kitti/ImageSets")
    a = p.parse_args()
    ids = gen_unlabeled_split(a.src_root, a.split_root)
    print(f"unlabeled_data_list: {len(ids)}")
