"""RoadSideEvaluator: detections -> nusc-style results -> KITTI txt -> R40 AP.

Parity with /root/reference/evaluators/det_evaluators.py:18-176 and
result2kitti.py:62-72. The ego->global transform is applied like the reference
(it is the identity for the roadside datasets, whose info files carry identity
ego poses), and the headline artifact
`<metrics>/R40/epoch_result_<Car_3D_moderate_strict>.txt` is preserved.
"""
from __future__ import annotations

import json
import math
import os
from typing import List, Sequence

import numpy as np

from sgv3d_tpu.evalkit import kitti_common
from sgv3d_tpu.evalkit.eval_ap import kitti_eval
from sgv3d_tpu.evalkit.kitti_writer import (
    dair_raw_calib, kitti_root_calib, result2kitti, rope3d_raw_calib)


def _yaw_rotate(quat_wxyz, center, yaw):
    """Rotate a box center/yaw by an ego2global quaternion (identity-safe)."""
    w, x, y, z = quat_wxyz
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    new_center = R @ np.asarray(center, np.float64)
    # yaw rotates by the quaternion's z rotation
    dyaw = math.atan2(R[1, 0], R[0, 0])
    return new_center, yaw + dyaw


def format_results(results: Sequence, img_metas: Sequence,
                   class_names: Sequence[str]) -> dict:
    """Per-sample (boxes (N, 9), scores (N,), labels (N,)) -> nusc-style
    results dict {token: [anno, ...]} (det_evaluators.py:108-167)."""
    nusc_annos: dict = {}
    for sample_id, det in enumerate(results):
        boxes, scores, labels = det[:3]
        meta = img_metas[sample_id]
        token = meta["token"]
        trans = np.asarray(meta.get("ego2global_translation", [0, 0, 0]))
        quat = np.asarray(meta.get("ego2global_rotation", [1, 0, 0, 0]))
        annos = []
        for i, box in enumerate(boxes):
            name = class_names[int(labels[i])]
            center = np.asarray(box[:3], np.float64)
            wlh = np.asarray(box[[4, 3, 5]], np.float64)
            yaw = float(box[6])
            center, yaw = _yaw_rotate(quat, center, yaw)
            center = center + trans
            annos.append(dict(
                sample_token=token,
                translation=center.tolist(),
                size=wlh.tolist(),
                box_yaw=float(box[6]),
                velocity=[float(box[7]), float(box[8])],
                detection_name=name,
                detection_score=float(scores[i]),
            ))
        nusc_annos.setdefault(token, []).extend(annos)
    return nusc_annos


def kitti_evaluation(pred_label_path: str, gt_label_path: str,
                     current_classes=("Car", "Pedestrian", "Cyclist"),
                     metric_path: str = "outputs/metrics"):
    """Run R40 AP over written label dirs; writes the epoch_result artifact."""
    pred_annos, image_ids = kitti_common.get_label_annos(
        pred_label_path, return_ids=True)
    gt_annos = kitti_common.get_label_annos(gt_label_path, image_ids=image_ids)
    result, ret_dict = kitti_eval(gt_annos, pred_annos,
                                  current_classes=list(current_classes),
                                  metric="R40")
    mAP_3d_moderate = ret_dict["KITTI/Car_3D_moderate_strict"]
    os.makedirs(os.path.join(metric_path, "R40"), exist_ok=True)
    with open(os.path.join(
            metric_path, "R40",
            f"epoch_result_{round(mAP_3d_moderate, 2)}.txt"), "w") as f:
        f.write(result)
    print(result)
    return mAP_3d_moderate, ret_dict


class RoadSideEvaluator:
    def __init__(self, class_names, current_classes, data_root, gt_label_path,
                 output_dir="outputs"):
        self.class_names = list(class_names)
        self.current_classes = list(current_classes)
        self.data_root = data_root
        self.gt_label_path = gt_label_path
        self.output_dir = output_dir

    def _calib_provider(self):
        if ("dair-v2x-i-kitti" in self.data_root
                or "rope3d-kitti" in self.data_root):
            return kitti_root_calib(self.data_root)
        if "dair-v2x-i" in self.data_root:
            return dair_raw_calib(self.data_root)
        with open(os.path.join(os.path.dirname(self.data_root.rstrip("/")),
                               "rope3d-kitti", "map_token2id.json")) as f:
            token2id = json.load(f)
        return rope3d_raw_calib(self.data_root, token2id)

    def evaluate(self, results, img_metas):
        nusc_results = format_results(results, img_metas, self.class_names)
        os.makedirs(self.output_dir, exist_ok=True)
        res_path = os.path.join(self.output_dir, "results_nusc.json")
        with open(res_path, "w") as f:
            json.dump({"meta": {"use_camera": True}, "results": nusc_results},
                      f)
        pred_label_path = result2kitti(
            nusc_results, self.output_dir, self._calib_provider())
        return kitti_evaluation(
            pred_label_path, self.gt_label_path,
            current_classes=self.current_classes,
            metric_path=os.path.join(self.output_dir, "metrics"))
