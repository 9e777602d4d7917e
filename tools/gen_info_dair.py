#!/usr/bin/env python
"""CLI: raw DAIR-V2X-I -> info pkls
(reference: /root/reference/scripts/gen_info_dair.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.dair import gen_info_dair_main  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dair-root", default="data/dair-v2x-i")
    p.add_argument("--split-json",
                   default="data/single-infrastructure-split-data.json")
    a = p.parse_args()
    gen_info_dair_main(a.dair_root, a.split_json)
