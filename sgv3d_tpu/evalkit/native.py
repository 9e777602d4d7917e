"""ctypes loader for the C++ KITTI eval kernels (compiled on first use)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "kitti_eval.cpp")
_SO = os.path.join(_HERE, "cpp", "libkitti_eval.so")
_LOCK = threading.Lock()
_LIB = None

def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _LIB = ctypes.CDLL(_SO)
        _LIB.rotate_iou_eval.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p]
        _LIB.d3_box_overlap_kernel.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        _LIB.image_box_overlap.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_void_p]
        _LIB.compute_statistics.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        _LIB.collect_tp_scores.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p]
        _LIB.fused_statistics.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p]
        return _LIB


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def rotate_iou_eval(boxes: np.ndarray, qboxes: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    """Rotated-rect IoU matrix (N, K); boxes are (cx, cy, w, h, angle) fp32."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    qboxes = np.ascontiguousarray(qboxes, np.float32)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), np.float32)
    if n and k:
        lib().rotate_iou_eval(_ptr(boxes), n, _ptr(qboxes), k, criterion,
                              _ptr(out))
    return out


def bev_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                    criterion: int = -1) -> np.ndarray:
    return rotate_iou_eval(boxes, qboxes, criterion).astype(np.float64)


def d3_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                   criterion: int = -1) -> np.ndarray:
    """Camera-frame 3D IoU; boxes (N, 7) = [x, y, z, l, h, w, ry] fp64."""
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    rinc = rotate_iou_eval(boxes[:, [0, 2, 3, 5, 6]],
                           qboxes[:, [0, 2, 3, 5, 6]], 2).astype(np.float64)
    n, k = boxes.shape[0], qboxes.shape[0]
    if n and k:
        lib().d3_box_overlap_kernel(_ptr(boxes), n, _ptr(qboxes), k,
                                    _ptr(rinc), criterion)
    return rinc


def image_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float64)
    qboxes = np.ascontiguousarray(qboxes, np.float64)
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), np.float64)
    if n and k:
        lib().image_box_overlap(_ptr(boxes), n, _ptr(qboxes), k, criterion,
                                _ptr(out))
    return out


def compute_statistics(overlaps: np.ndarray, gt_datas: np.ndarray,
                       dt_datas: np.ndarray, ignored_gt: np.ndarray,
                       ignored_det: np.ndarray, dc_bboxes: np.ndarray,
                       metric: int, min_overlap: float, thresh: float = 0.0,
                       compute_fp: bool = False, compute_aos: bool = False):
    """One frame's TP/FP/FN assignment; mirrors compute_statistics_jit.

    Returns (tp, fp, fn, similarity, thresholds[:thresh_count]).
    """
    det_size, gt_size = dt_datas.shape[0], gt_datas.shape[0]
    overlaps = np.ascontiguousarray(overlaps, np.float64)
    gt_datas = np.ascontiguousarray(gt_datas, np.float64).reshape(gt_size, 5)
    dt_datas = np.ascontiguousarray(dt_datas, np.float64).reshape(det_size, 6)
    ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, np.int64)
    dc_bboxes = np.ascontiguousarray(dc_bboxes, np.float64)
    counts = np.zeros(4, np.int64)
    sim = np.zeros(1, np.float64)
    thresholds = np.zeros(max(gt_size, 1), np.float64)
    lib().compute_statistics(
        _ptr(overlaps), det_size, gt_size, _ptr(gt_datas), _ptr(dt_datas),
        _ptr(ignored_gt), _ptr(ignored_det), _ptr(dc_bboxes),
        dc_bboxes.shape[0], metric, min_overlap, thresh, int(compute_fp),
        int(compute_aos), _ptr(counts), _ptr(sim), _ptr(thresholds))
    tp, fp, fn, cnt = counts
    return int(tp), int(fp), int(fn), float(sim[0]), thresholds[:cnt]


class FrameSet:
    """Concatenated per-frame eval arrays for the fused C++ entry points.

    Holds the flattened (det, gt) overlap blocks plus gt/dt data rows and the
    per-(class, difficulty) ignore/dontcare arrays, so a whole dataset's
    statistics run in ONE ctypes call (the reference fuses frames into parts,
    /root/reference/evaluators/kitti_utils/eval.py:292-350,516-544; we fuse
    the entire set)."""

    def __init__(self, overlaps, gt_datas_list, dt_datas_list,
                 ignored_gts, ignored_dets, dontcares):
        self.num_frames = len(overlaps)
        self.det_sizes = np.array([d.shape[0] for d in dt_datas_list],
                                  np.int64)
        self.gt_sizes = np.array([g.shape[0] for g in gt_datas_list],
                                 np.int64)
        self.ov_flat = (np.concatenate(
            [np.ascontiguousarray(o, np.float64).reshape(-1)
             for o in overlaps])
            if overlaps else np.zeros(0, np.float64))
        self.gt_flat = (np.concatenate(
            [np.ascontiguousarray(g, np.float64).reshape(-1, 5)
             for g in gt_datas_list])
            if gt_datas_list else np.zeros((0, 5), np.float64))
        self.dt_flat = (np.concatenate(
            [np.ascontiguousarray(d, np.float64).reshape(-1, 6)
             for d in dt_datas_list])
            if dt_datas_list else np.zeros((0, 6), np.float64))
        self.ig_gt_flat = (np.concatenate(
            [np.ascontiguousarray(a, np.int64).reshape(-1)
             for a in ignored_gts])
            if ignored_gts else np.zeros(0, np.int64))
        self.ig_dt_flat = (np.concatenate(
            [np.ascontiguousarray(a, np.int64).reshape(-1)
             for a in ignored_dets])
            if ignored_dets else np.zeros(0, np.int64))
        self.dc_nums = np.array([d.shape[0] for d in dontcares], np.int64)
        self.dc_flat = (np.concatenate(
            [np.ascontiguousarray(d, np.float64).reshape(-1, 4)
             for d in dontcares])
            if dontcares else np.zeros((0, 4), np.float64))


def collect_tp_scores(fs: FrameSet, metric: int,
                      min_overlap: float) -> np.ndarray:
    """All frames' true-positive scores (compute_fp=False pass) in one call."""
    out = np.zeros(max(int(fs.gt_sizes.sum()), 1), np.float64)
    count = np.zeros(1, np.int64)
    lib().collect_tp_scores(
        _ptr(fs.ov_flat), _ptr(fs.det_sizes), _ptr(fs.gt_sizes),
        fs.num_frames, _ptr(fs.gt_flat), _ptr(fs.dt_flat),
        _ptr(fs.ig_gt_flat), _ptr(fs.ig_dt_flat), _ptr(fs.dc_flat),
        _ptr(fs.dc_nums), metric, min_overlap, _ptr(out), _ptr(count))
    return out[: int(count[0])]


def fused_statistics(fs: FrameSet, metric: int, min_overlap: float,
                     thresholds: np.ndarray,
                     compute_aos: bool = False) -> np.ndarray:
    """Accumulated pr (num_thresh, 4) [tp, fp, fn, similarity] over all
    frames x thresholds in one call."""
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    pr = np.zeros((max(len(thresholds), 1), 4), np.float64)
    if len(thresholds):
        lib().fused_statistics(
            _ptr(fs.ov_flat), _ptr(fs.det_sizes), _ptr(fs.gt_sizes),
            fs.num_frames, _ptr(fs.gt_flat), _ptr(fs.dt_flat),
            _ptr(fs.ig_gt_flat), _ptr(fs.ig_dt_flat), _ptr(fs.dc_flat),
            _ptr(fs.dc_nums), metric, min_overlap, _ptr(thresholds),
            len(thresholds), int(compute_aos), _ptr(pr))
    return pr[: len(thresholds)]
