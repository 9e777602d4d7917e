"""KITTI label file parsing.

Parity with /root/reference/evaluators/kitti_utils/kitti_common.py:561-677,
including the category map that merges Bus into Car (:10) and the dimensions
column reorder [2, 0, 1].
"""
from __future__ import annotations

import os
import re
from typing import Sequence

import numpy as np

CATEGORY_MAP = {"Car": "Car", "Bus": "Car", "Pedestrian": "Pedestrian",
                "Cyclist": "Cyclist"}


def get_label_anno(label_path: str) -> dict:
    annotations = {}
    with open(label_path, "r") as f:
        lines = f.readlines()
    if len(lines) == 0 or len(lines[0]) < 15:
        content = []
    else:
        content = [line.strip().split(" ") for line in lines]
    num_objects = len([x[0] for x in content if x[0] != "DontCare"])
    annotations["name"] = np.array([CATEGORY_MAP[x[0]] for x in content])
    num_gt = len(annotations["name"])
    annotations["truncated"] = np.array([float(x[1]) for x in content])
    annotations["occluded"] = np.array([float(x[2]) for x in content])
    annotations["alpha"] = np.array([float(x[3]) for x in content])
    annotations["bbox"] = np.array(
        [[float(v) for v in x[4:8]] for x in content]).reshape(-1, 4)
    annotations["dimensions"] = np.array(
        [[float(v) for v in x[8:11]] for x in content]).reshape(-1, 3)[:, [2, 0, 1]]
    annotations["location"] = np.array(
        [[float(v) for v in x[11:14]] for x in content]).reshape(-1, 3)
    annotations["rotation_y"] = np.array(
        [float(x[14]) for x in content]).reshape(-1)
    if len(content) != 0 and len(content[0]) == 16:
        annotations["score"] = np.array([float(x[15]) for x in content])
    else:
        annotations["score"] = np.zeros((annotations["bbox"].shape[0],))
    index = list(range(num_objects)) + [-1] * (num_gt - num_objects)
    annotations["index"] = np.array(index, dtype=np.int32)
    annotations["group_ids"] = np.arange(num_gt, dtype=np.int32)
    return annotations


def get_label_annos(label_folder: str,
                    image_ids: Sequence[int] | None = None,
                    return_ids: bool = False):
    if image_ids is None:
        prog = re.compile(r"^\d{6}.txt$")
        names = [f for f in os.listdir(label_folder) if prog.match(f)]
        image_ids = sorted(int(f[:6]) for f in names)
    annos = []
    for idx in image_ids:
        path = os.path.join(label_folder, f"{idx:06d}.txt")
        anno = get_label_anno(path)
        n = anno["name"].shape[0]
        anno["image_idx"] = np.full(n, idx, dtype=np.int64)
        annos.append(anno)
    if return_ids:
        return annos, list(image_ids)
    return annos
