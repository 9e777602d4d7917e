#!/usr/bin/env python
"""CLI: rope3d-kitti tree -> info pkls (incl. ssdg + unlabeled splits)
(reference: /root/reference/scripts/gen_info_rope3d_kitti.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.rope3d import gen_info_rope3d_kitti_main  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default="data/rope3d-kitti")
    a = p.parse_args()
    gen_info_rope3d_kitti_main(a.data_root)
