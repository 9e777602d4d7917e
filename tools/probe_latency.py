#!/usr/bin/env python
"""Serving LATENCY probe: single-batch end-to-end time per model family.

The reference's README headline claims SGV3D adds "only a minimal increase
in latency" over BEVHeight (/root/reference/README.md:40); this probe
records the rebuild's counterpart numbers: per-batch serving latency
(dispatch -> host-visible detections) for the BEVHeight-r50/r101 and
SGV3D-r50 serving graphs at small batch sizes.

Relay caveats (CLAUDE.md landmines): on the axon relay (a) every host
fetch costs a ~28 ms round trip, and (b) host->device input transfer runs
at ~20-30 MB/s — a bs1 864x1536 uint8 image is ~4 MB, so the transfer
alone is ~150+ ms that a real co-located host (PCIe/DMA) would not pay.
The probe therefore reports BOTH:
  * e2e_ms        — host numpy uint8 in -> host detections out (includes
                    the relay transfer; real-host latency is lower), and
  * device_ms     — input already device-resident -> host detections out
                    (on-device compute + the fetch round trip; the honest
                    per-batch serving latency for this chip).
Throughput numbers live in bench.py; this tool is the latency axis, the
counterpart of the reference's "only a minimal increase in latency"
SGV3D-vs-BEVHeight claim (/root/reference/README.md:40).

Run (TPU): python tools/probe_latency.py [--exps a b ...] [--batches 1 4 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def _median_time(fn, iters=7, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def relay_floor_ms() -> float:
    """Round-trip of fetching a freshly computed 1-float result."""
    x = jnp.zeros((), jnp.float32)
    f = jax.jit(lambda v: v + 1.0)
    return 1e3 * _median_time(lambda: np.asarray(f(x)))


def _to_uint8(imgs_norm: np.ndarray) -> np.ndarray:
    """Raw-camera-style uint8 frames (the serving input convention; the
    predictor imnormalizes on device)."""
    return np.clip(imgs_norm * 58.0 + 114.0, 0, 255).astype(np.uint8)


def family_latency(exp: str, batches, floor_ms: float):
    from sgv3d_tpu.api import BEVHeightPredictor
    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight

    cfg = get_exp(exp)
    imgs1, mats1, *_ = make_batch(cfg, batch=1, num_objs=8)
    # jitted: un-jitted init is a relay round trip PER OP (minutes at r101)
    variables = jax.jit(BEVHeight(cfg).init, static_argnums=3)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs1), {k: jnp.asarray(v) for k, v in mats1.items()},
        False)
    pred = BEVHeightPredictor(cfg, variables)
    rows = []
    for bs in batches:
        imgs_f, mats, *_ = make_batch(cfg, batch=bs, num_objs=8)
        imgs = _to_uint8(imgs_f)

        def one_host():
            # host uint8 in -> host detections out (predictor fences)
            return pred(imgs, mats)

        # device-resident input: what a real host's DMA'd batch looks like
        imgs_dev = jnp.asarray(imgs)
        jmats_dev = {k: jnp.asarray(np.asarray(v)) for k, v in mats.items()}
        cells, pix_keep = (pred._rig_cells(mats, jmats_dev)
                           if pred.static_rig else (None, None))

        def one_dev():
            return pred._collect(
                pred._infer(pred.variables, imgs_dev, jmats_dev, cells,
                            pix_keep))

        e2e = 1e3 * _median_time(one_host)
        dev = 1e3 * _median_time(one_dev)
        rows.append({"batch": bs, "e2e_ms": round(e2e, 1),
                     "device_ms": round(dev, 1),
                     "device_minus_floor_ms": round(max(dev - floor_ms, 0), 1),
                     "per_image_device_ms": round(dev / bs, 1)})
        print(f"  {exp} bs{bs}: e2e {e2e:.1f} ms, device-resident "
              f"{dev:.1f} ms ({dev / bs:.1f} ms/img)", flush=True)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exps", nargs="+",
                        default=["bevheight_rope3d_r50_128", "sgv3d_r50_128",
                                 "bevheight_dair_r101_128"])
    parser.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    parser.add_argument("--out", default=None,
                        help="optional JSON artifact path")
    args = parser.parse_args()

    floor = relay_floor_ms()
    print(f"relay fetch floor: {floor:.1f} ms", flush=True)
    report = {"relay_floor_ms": round(floor, 1), "families": {}}
    for exp in args.exps:
        print(f"=== {exp} ===", flush=True)
        # the relay's remote_compile occasionally drops an HTTP body
        # mid-flight; one retry rides it out
        for attempt in (1, 2):
            try:
                report["families"][exp] = family_latency(
                    exp, args.batches, floor)
                break
            except Exception as e:  # noqa: BLE001 — transient relay errors
                print(f"  attempt {attempt} failed: {e}", flush=True)
                report["families"][exp] = {"error": str(e)}
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
