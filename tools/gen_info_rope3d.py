#!/usr/bin/env python
"""CLI: raw Rope3D -> info pkls
(reference: /root/reference/scripts/gen_info_rope3d.py)."""
import argparse
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from converters.rope3d import generate_info_rope3d  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--rope3d-root", default="data/rope3d")
    a = p.parse_args()
    train = generate_info_rope3d(a.rope3d_root, "train")
    val = generate_info_rope3d(a.rope3d_root, "val")
    with open(os.path.join(a.rope3d_root,
                           "rope3d_12hz_infos_train.pkl"), "wb") as f:
        pickle.dump(train, f)
    with open(os.path.join(a.rope3d_root,
                           "rope3d_12hz_infos_val.pkl"), "wb") as f:
        pickle.dump(val, f)
    for info in val:
        info["ann_infos"] = []
    total = train + val
    random.shuffle(total)
    with open(os.path.join(a.rope3d_root,
                           "rope3d_12hz_infos_trainval.pkl"), "wb") as f:
        pickle.dump(total, f)
