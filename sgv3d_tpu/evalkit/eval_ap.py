"""KITTI R40 AP evaluation driver.

Ports the orchestration of /root/reference/evaluators/kitti_utils/eval.py
(:28-80 clean_data, :7-25 thresholds, :450-568 eval_class, :591-760
do_eval/kitti_eval) over the C++ kernels in native.py. Thresholding,
difficulty filters, min_overlap tables and the result string format all match
the reference so `outputs/metrics/R40/epoch_result_<mAP>.txt` is drop-in
comparable.
"""
from __future__ import annotations

import io
from typing import List

import numpy as np

from sgv3d_tpu.evalkit import native

CLASS_TO_NAME = {0: "Car", 1: "Pedestrian", 2: "Cyclist", 3: "Bus",
                 4: "Person_sitting"}
NAME_TO_CLASS = {v: k for k, v in CLASS_TO_NAME.items()}


def get_thresholds(scores: np.ndarray, num_gt: int,
                   num_sample_pts: int = 41) -> np.ndarray:
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1 / (num_sample_pts - 1.0)
    return np.array(thresholds)


def clean_data(gt_anno: dict, dt_anno: dict, current_class: int,
               difficulty: int):
    CLASS_NAMES = ["car", "pedestrian", "cyclist", "bus"]
    MIN_HEIGHT = [40, 25, 25]
    MAX_OCCLUSION = [0, 1, 2]
    MAX_TRUNCATION = [0.15, 0.3, 0.5]
    dc_bboxes, ignored_gt, ignored_dt = [], [], []
    cls_name = CLASS_NAMES[current_class].lower()
    num_valid_gt = 0
    for i in range(len(gt_anno["name"])):
        gt_name = gt_anno["name"][i].lower()
        height = gt_anno["bbox"][i][3] - gt_anno["bbox"][i][1]
        if gt_name == cls_name:
            valid_class = 1
        elif cls_name == "pedestrian" and gt_name == "person_sitting":
            valid_class = 0
        elif cls_name == "car" and gt_name == "van":
            valid_class = 0
        else:
            valid_class = -1
        ignore = (gt_anno["occluded"][i] > MAX_OCCLUSION[difficulty]
                  or gt_anno["truncated"][i] > MAX_TRUNCATION[difficulty]
                  or height <= MIN_HEIGHT[difficulty])
        if valid_class == 1 and not ignore:
            ignored_gt.append(0)
            num_valid_gt += 1
        elif valid_class == 0 or (ignore and valid_class == 1):
            ignored_gt.append(1)
        else:
            ignored_gt.append(-1)
        if gt_anno["name"][i] == "DontCare":
            dc_bboxes.append(gt_anno["bbox"][i])
    for i in range(len(dt_anno["name"])):
        valid_class = 1 if dt_anno["name"][i].lower() == cls_name else -1
        height = abs(dt_anno["bbox"][i, 3] - dt_anno["bbox"][i, 1])
        if height < MIN_HEIGHT[difficulty]:
            ignored_dt.append(1)
        elif valid_class == 1:
            ignored_dt.append(0)
        else:
            ignored_dt.append(-1)
    return num_valid_gt, ignored_gt, ignored_dt, dc_bboxes


def _overlaps_per_frame(gt_annos, dt_annos, metric) -> List[np.ndarray]:
    """(det, gt) overlap matrix per frame (reference computes gt-major parts
    and indexes [j, i]; we compute det-major directly)."""
    out = []
    for gt, dt in zip(gt_annos, dt_annos):
        if metric == 0:
            ov = native.image_box_overlap(dt["bbox"], gt["bbox"])
        elif metric == 1:
            dt_b = np.concatenate(
                [dt["location"][:, [0, 2]], dt["dimensions"][:, [0, 2]],
                 dt["rotation_y"][:, None]], axis=1)
            gt_b = np.concatenate(
                [gt["location"][:, [0, 2]], gt["dimensions"][:, [0, 2]],
                 gt["rotation_y"][:, None]], axis=1)
            ov = native.bev_box_overlap(dt_b, gt_b)
        elif metric == 2:
            dt_b = np.concatenate(
                [dt["location"], dt["dimensions"], dt["rotation_y"][:, None]],
                axis=1)
            gt_b = np.concatenate(
                [gt["location"], gt["dimensions"], gt["rotation_y"][:, None]],
                axis=1)
            ov = native.d3_box_overlap(dt_b, gt_b)
        else:
            raise ValueError(metric)
        out.append(ov.astype(np.float64))
    return out


def _clean_data_all(gt_annos, dt_annos, current_class, difficulty):
    """clean_data over all frames; metric-independent, so cacheable."""
    total_num_valid_gt = 0
    ig_gts, ig_dts, dcs = [], [], []
    for gt, dt in zip(gt_annos, dt_annos):
        num_valid_gt, ig_gt, ig_dt, dc = clean_data(
            gt, dt, current_class, difficulty)
        total_num_valid_gt += num_valid_gt
        ig_gts.append(np.array(ig_gt, np.int64))
        ig_dts.append(np.array(ig_dt, np.int64))
        dcs.append(np.stack(dc, 0).astype(np.float64) if dc
                   else np.zeros((0, 4), np.float64))
    return total_num_valid_gt, ig_gts, ig_dts, dcs


def eval_class(gt_annos, dt_annos, current_classes, difficultys, metric,
               min_overlaps, compute_aos=False, cleaned_cache=None):
    """Returns dict with recall/precision/aos arrays
    [num_class, num_difficulty, num_minoverlap, 41].

    The per-frame x per-threshold statistics run fused in C++ (one ctypes
    call per (class, difficulty, min_overlap) for the whole frame set),
    porting /root/reference/evaluators/kitti_utils/eval.py:292-350,447-565.
    `cleaned_cache` (optional dict) shares the metric-independent clean_data
    results across the bbox/bev/3d passes.
    """
    assert len(gt_annos) == len(dt_annos)
    overlaps = _overlaps_per_frame(gt_annos, dt_annos, metric)
    gt_datas_list = [np.concatenate([gt["bbox"], gt["alpha"][:, None]], 1)
                     for gt in gt_annos]
    dt_datas_list = [np.concatenate(
        [dt["bbox"], dt["alpha"][:, None], dt["score"][:, None]], 1)
        for dt in dt_annos]
    if cleaned_cache is None:
        cleaned_cache = {}

    N_SAMPLE_PTS = 41
    num_minoverlap = len(min_overlaps)
    precision = np.zeros(
        [len(current_classes), len(difficultys), num_minoverlap, N_SAMPLE_PTS])
    recall = np.zeros_like(precision)
    aos = np.zeros_like(precision)

    for m, current_class in enumerate(current_classes):
        for d_idx, difficulty in enumerate(difficultys):
            key = (current_class, difficulty)
            if key not in cleaned_cache:
                cleaned_cache[key] = _clean_data_all(
                    gt_annos, dt_annos, current_class, difficulty)
            total_num_valid_gt, ig_gts, ig_dts, dcs = cleaned_cache[key]
            fs = native.FrameSet(overlaps, gt_datas_list, dt_datas_list,
                                 ig_gts, ig_dts, dcs)
            for k, min_overlap in enumerate(min_overlaps[:, metric, m]):
                all_thresholds = native.collect_tp_scores(
                    fs, metric, min_overlap)
                if total_num_valid_gt == 0:
                    continue
                thresholds = get_thresholds(
                    np.array(all_thresholds), total_num_valid_gt)
                pr = native.fused_statistics(
                    fs, metric, min_overlap, np.array(thresholds),
                    compute_aos=compute_aos)
                for i in range(len(thresholds)):
                    recall[m, d_idx, k, i] = pr[i, 0] / (pr[i, 0] + pr[i, 2])
                    precision[m, d_idx, k, i] = pr[i, 0] / (pr[i, 0] + pr[i, 1])
                    if compute_aos:
                        aos[m, d_idx, k, i] = pr[i, 3] / (pr[i, 0] + pr[i, 1])
                for i in range(len(thresholds)):
                    precision[m, d_idx, k, i] = np.max(
                        precision[m, d_idx, k, i:], axis=-1)
                    recall[m, d_idx, k, i] = np.max(
                        recall[m, d_idx, k, i:], axis=-1)
                    if compute_aos:
                        aos[m, d_idx, k, i] = np.max(aos[m, d_idx, k, i:],
                                                     axis=-1)
    return {"recall": recall, "precision": precision, "orientation": aos}


def get_mAP(prec):
    sums = 0
    for i in range(0, prec.shape[-1], 4):
        sums = sums + prec[..., i]
    return sums / 11 * 100


def get_mAP_R40(prec):
    sums = 0
    for i in range(1, prec.shape[-1]):
        sums = sums + prec[..., i]
    return sums / 40 * 100


def do_eval(gt_annos, dt_annos, current_classes, min_overlaps,
            eval_types=("bbox", "bev", "3d"), metric="R40"):
    difficultys = [0, 1, 2]
    map_fn = get_mAP_R40 if metric == "R40" else get_mAP
    mAP_bbox = mAP_aos = mAP_bev = mAP_3d = None
    cleaned_cache = {}  # clean_data is metric-independent; share across passes
    if "bbox" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 0,
                         min_overlaps, compute_aos=("aos" in eval_types),
                         cleaned_cache=cleaned_cache)
        mAP_bbox = map_fn(ret["precision"])
        if "aos" in eval_types:
            mAP_aos = map_fn(ret["orientation"])
    if "bev" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 1,
                         min_overlaps, cleaned_cache=cleaned_cache)
        mAP_bev = map_fn(ret["precision"])
    if "3d" in eval_types:
        ret = eval_class(gt_annos, dt_annos, current_classes, difficultys, 2,
                         min_overlaps, cleaned_cache=cleaned_cache)
        mAP_3d = map_fn(ret["precision"])
    return mAP_bbox, mAP_bev, mAP_3d, mAP_aos


def kitti_eval(gt_annos, dt_annos, current_classes,
               eval_types=("bbox", "bev", "3d"), metric="R40"):
    """Full KITTI eval; returns (result string, ret_dict). Min-overlap tables
    match /root/reference/evaluators/kitti_utils/eval.py:671-677."""
    eval_types = list(eval_types)
    overlap_0_7 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5]] * 3)
    overlap_0_5 = np.array([[0.7, 0.5, 0.5, 0.7, 0.5],
                            [0.5, 0.25, 0.25, 0.5, 0.25],
                            [0.5, 0.25, 0.25, 0.5, 0.25]])
    min_overlaps = np.stack([overlap_0_7, overlap_0_5], axis=0)  # [2, 3, 5]
    if not isinstance(current_classes, (list, tuple)):
        current_classes = [current_classes]
    current_classes = [NAME_TO_CLASS[c] if isinstance(c, str) else c
                       for c in current_classes]
    min_overlaps = min_overlaps[:, :, current_classes]

    pred_alpha = any(a["alpha"].shape[0] != 0 for a in dt_annos)
    valid_alpha_gt = any(
        a["alpha"].shape[0] and a["alpha"][0] != -10 for a in gt_annos)
    compute_aos = pred_alpha and valid_alpha_gt
    if compute_aos:
        eval_types.append("aos")

    mAPbbox, mAPbev, mAP3d, mAPaos = do_eval(
        gt_annos, dt_annos, current_classes, min_overlaps, eval_types, metric)

    result = ""
    ret_dict = {}
    difficulty = ["easy", "moderate", "hard"]
    for j, curcls in enumerate(current_classes):
        curcls_name = CLASS_TO_NAME[curcls]
        for i in range(min_overlaps.shape[0]):
            result += ("{} AP@{:.2f}, {:.2f}, {:.2f}:\n".format(
                curcls_name, *min_overlaps[i, :, j]))
            if mAPbbox is not None:
                result += "bbox AP:{:.4f}, {:.4f}, {:.4f}\n".format(
                    *mAPbbox[j, :, i])
            if mAPbev is not None:
                result += "bev  AP:{:.4f}, {:.4f}, {:.4f}\n".format(
                    *mAPbev[j, :, i])
            if mAP3d is not None:
                result += "3d   AP:{:.4f}, {:.4f}, {:.4f}\n".format(
                    *mAP3d[j, :, i])
            if compute_aos:
                result += "aos  AP:{:.2f}, {:.2f}, {:.2f}\n".format(
                    *mAPaos[j, :, i])
            for idx in range(3):
                postfix = (f"{difficulty[idx]}_strict" if i == 0
                           else f"{difficulty[idx]}_loose")
                prefix = f"KITTI/{curcls_name}"
                if mAP3d is not None:
                    ret_dict[f"{prefix}_3D_{postfix}"] = mAP3d[j, idx, i]
                if mAPbev is not None:
                    ret_dict[f"{prefix}_BEV_{postfix}"] = mAPbev[j, idx, i]
                if mAPbbox is not None:
                    ret_dict[f"{prefix}_2D_{postfix}"] = mAPbbox[j, idx, i]

    if len(current_classes) > 1:
        result += "\nOverall AP@{}, {}, {}:\n".format(*difficulty)
        if mAPbbox is not None:
            mAPbbox = mAPbbox.mean(axis=0)
            result += "bbox AP:{:.4f}, {:.4f}, {:.4f}\n".format(*mAPbbox[:, 0])
        if mAPbev is not None:
            mAPbev = mAPbev.mean(axis=0)
            result += "bev  AP:{:.4f}, {:.4f}, {:.4f}\n".format(*mAPbev[:, 0])
        if mAP3d is not None:
            mAP3d = mAP3d.mean(axis=0)
            result += "3d   AP:{:.4f}, {:.4f}, {:.4f}\n".format(*mAP3d[:, 0])
        if compute_aos:
            mAPaos = mAPaos.mean(axis=0)
            result += "aos  AP:{:.2f}, {:.2f}, {:.2f}\n".format(*mAPaos[:, 0])
        for idx in range(3):
            postfix = f"{difficulty[idx]}"
            if mAP3d is not None:
                ret_dict[f"KITTI/Overall_3D_{postfix}"] = mAP3d[idx, 0]
            if mAPbev is not None:
                ret_dict[f"KITTI/Overall_BEV_{postfix}"] = mAPbev[idx, 0]
            if mAPbbox is not None:
                ret_dict[f"KITTI/Overall_2D_{postfix}"] = mAPbbox[idx, 0]
    return result, ret_dict
