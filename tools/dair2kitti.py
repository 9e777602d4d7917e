#!/usr/bin/env python
"""CLI: raw DAIR-V2X-I -> KITTI-format tree
(reference: /root/reference/scripts/data_converter/dair2kitti.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.dair import dair2kitti  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser("Generate the KITTI-format DAIR-V2X-I tree")
    p.add_argument("--source-root", default="data/dair-v2x-i")
    p.add_argument("--target-root", default="data/dair-v2x-i-kitti")
    p.add_argument("--split-path",
                   default="data/single-infrastructure-split-data-het.json")
    a = p.parse_args()
    dair2kitti(a.source_root, a.target_root, a.split_path)
