#!/usr/bin/env python
"""Training-step FLOPs + MFU statement (VERDICT r4 next-step #7).

Lowers the EXACT bench_train.py step graph (same exp, batch, dtype, donate)
via jax's pre-compile HLO cost analysis — no execution — and converts the
measured ms/step (BENCH_TRAIN_BASELINE.json / the perf ledger) into achieved
TFLOP/s, set against the chip's measured ceilings:

  * ~142 TFLOP/s bf16 matmul peak (tools/roofline.py, x16-chained 8192^3)
  * ~44  TFLOP/s XLA 3x3-conv rate at big spatial maps (HBM-bound;
    VMEM-resident chained convs reach ~148 — tools/probe_aspp.py)

Run on CPU (the lowering is backend-independent; ~2 min of tracing on the
1-core host):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python tools/train_mfu.py \
      --ms_per_step 263
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="sgv3d_r50_128")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--ms_per_step", type=float, default=263.0,
                        help="measured step time to convert (perf ledger: "
                             "263 ms bs2 async-dispatched, fenced once)")
    parser.add_argument("--fp32", action="store_true")
    args = parser.parse_args()

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight
    from sgv3d_tpu.train.loop import create_train_state, make_train_step
    from sgv3d_tpu.train.optim import make_optimizer

    cfg = get_exp(args.exp)
    model = BEVHeight(cfg, dtype=None if args.fp32 else jnp.bfloat16)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=args.batch, num_objs=8)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=100)
    t0 = time.time()
    state = create_train_state(
        model, cfg, tx, (imgs[:1], {k: v[:1] for k, v in mats.items()}))
    step = make_train_step(model, cfg, tx, mesh=None, donate=True)
    jb = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
          jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
          jnp.asarray(gt_semantic))
    lowered = step.lower(state, *jb)
    ca = lowered.cost_analysis()
    print(f"# lowering took {time.time() - t0:.0f}s", flush=True)

    flops = float(ca["flops"])
    bytes_accessed = float(ca.get("bytes accessed", 0.0))
    tflops_per_step = flops / 1e12
    achieved = tflops_per_step / (args.ms_per_step / 1e3)
    out = {
        "exp": args.exp,
        "batch": args.batch,
        "dtype": "fp32" if args.fp32 else "bf16",
        "step_tflops": round(tflops_per_step, 3),
        "hlo_bytes_accessed_gb": round(bytes_accessed / 2**30, 2),
        "ms_per_step": args.ms_per_step,
        "achieved_tflops_per_s": round(achieved, 1),
        "conv_ceiling_tflops_per_s": 44.0,
        "matmul_peak_tflops_per_s": 142.0,
        "pct_of_conv_ceiling": round(100.0 * achieved / 44.0, 1),
        "pct_of_matmul_peak": round(100.0 * achieved / 142.0, 1),
    }
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(_REPO, "TRAIN_MFU.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
