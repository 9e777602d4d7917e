#!/usr/bin/env python
"""Quantify the bf16-backbone vs fp32 TRAINING divergence (VERDICT r3 #5).

The reference trains precision=32 (/root/reference/exps/...:532); the TPU
runner defaults to bf16 backbone convs (`--fp32` opts out). This probe
trains the tiny learnable scene twice from the SAME init/batches — once per
precision — for N steps on the real chip and reports the loss-curve delta.

Run on TPU (relay env):  python tools/probe_fp32_train.py [steps]
(CPU fallback runs both arms in fp32 and reports ~0 — the bf16 path only
engages on TPU, mirroring runner.build_model.)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def run_arm(cfg, batch, use_bf16: bool, steps: int, log_every: int = 10):
    from sgv3d_tpu.models.bev_height import BEVHeight
    from sgv3d_tpu.train.loop import create_train_state, make_train_step
    from sgv3d_tpu.train.optim import make_optimizer
    from sgv3d_tpu.train.sharding import make_mesh

    on_tpu = jax.devices()[0].platform != "cpu"
    model = BEVHeight(cfg, dtype=jnp.bfloat16 if (use_bf16 and on_tpu)
                      else None)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=100)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = batch
    state = create_train_state(
        model, cfg, tx, (imgs[:1], {k: v[:1] for k, v in mats.items()}),
        seed=0)
    step_fn = make_train_step(model, cfg, tx, mesh=make_mesh(1))
    jb = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
          jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
          jnp.asarray(gt_semantic) if gt_semantic is not None else None)
    losses, log_steps = [], []
    pending = None  # defer fetches one round so the relay round-trip overlaps
    pending_step = None
    for i in range(steps):
        state, metrics = step_fn(state, *jb)
        if (i + 1) % log_every == 0 or i + 1 == steps:
            if pending is not None:
                losses.append(float(jax.device_get(pending)))
                log_steps.append(pending_step)
            pending, pending_step = metrics["total_loss"], i + 1
    losses.append(float(jax.device_get(pending)))
    log_steps.append(pending_step)
    return np.asarray(losses), log_steps


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    import dataclasses

    from tiny_configs import tiny_exp

    from sgv3d_tpu.data.synthetic import make_batch

    cfg = tiny_exp(is_bsm=True)
    cfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, final_dim=(64, 96)))
    batch = make_batch(cfg, batch=8, num_objs=4, seed=5)

    t0 = time.time()
    bf16, log_steps = run_arm(cfg, batch, use_bf16=True, steps=steps)
    t1 = time.time()
    fp32, _ = run_arm(cfg, batch, use_bf16=False, steps=steps)
    t2 = time.time()

    tail = max(1, len(bf16) // 2)
    rel = np.abs(bf16 - fp32) / np.maximum(np.abs(fp32), 1e-6)
    print(f"platform={jax.devices()[0].platform} steps={steps} "
          f"log_points={len(bf16)}")
    print(f"bf16 arm {t1-t0:.0f}s, fp32 arm {t2-t1:.0f}s")
    print(f"final loss: bf16={bf16[-1]:.4f} fp32={fp32[-1]:.4f}")
    print(f"rel loss delta: mean={rel.mean():.4f} "
          f"tail_mean={rel[-tail:].mean():.4f} max={rel.max():.4f}")
    print("curves (step, bf16, fp32):")
    for s, a, b in zip(log_steps, bf16, fp32):
        print(f"  {s:4d} {a:10.4f} {b:10.4f}")


if __name__ == "__main__":
    main()
