#!/usr/bin/env python
"""CLI: raw Rope3D -> rope3d-kitti tree
(reference: /root/reference/scripts/data_converter/rope2kitti.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.rope3d import rope2kitti  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--source-root", default="data/rope3d")
    p.add_argument("--target-root", default="data/rope3d-kitti")
    a = p.parse_args()
    rope2kitti(a.source_root, a.target_root)
