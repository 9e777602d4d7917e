"""Training benchmark: SGV3D-r50 (BSM) train-step throughput on one TPU chip.

Prints JSON lines {"metric", "value", "unit", "vs_baseline"} like bench.py,
but for the TRAINING step — the reference's primary workload is 8-GPU
training (BASELINE.md schedules,
/root/reference/exps/sgv3d/bsm_bev_height_lss_r50_864_1536_128x128.py:523-534).
The LAST line is the result; a provisional (serial, fetch-contaminated,
pessimistic) line is emitted right after warmup so a driver kill mid-run
still leaves a measurement in the tail (VERDICT r4 next #8). The timed loop
itself fences ONCE — per-step fencing would bill a ~42 ms relay round trip
per step as compute (CLAUDE.md perf ledger).

Measures the full jitted step (forward + losses + backward + AdamW update)
with a device-resident batch (host->device transfer through the axon relay is
pathological and not representative — see CLAUDE.md), fenced by fetching the
loss to host. `vs_baseline` is the speedup over the round-2 measured step
time recorded in BENCH_TRAIN_BASELINE.json.

Env knobs: BENCH_TRAIN_BATCH (default 2), BENCH_TRAIN_ITERS (default 5),
BENCH_TRAIN_EXP (default sgv3d_r50_128), BENCH_TRAIN_TOPK (set to an int to
measure the opt-in `train_lift_top_k` top-k training lift; default exact).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.utils.budget import Budget

BATCH = int(os.environ.get("BENCH_TRAIN_BATCH", "2"))
ITERS = int(os.environ.get("BENCH_TRAIN_ITERS", "5"))
EXP = os.environ.get("BENCH_TRAIN_EXP", "sgv3d_r50_128")


def fence(x):
    np.asarray(jax.device_get(x))


def _emit(ms_per_step: float, iters: int, provisional: bool = False):
    baseline = None
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_TRAIN_BASELINE.json")
    if os.path.exists(cache):
        with open(cache) as f:
            baseline = json.load(f).get("ms_per_step")
    vs = (baseline / ms_per_step) if baseline else None
    rec = {
        "metric": f"{EXP}_train_bs{BATCH}_images_per_sec",
        "value": round(BATCH / ms_per_step * 1000.0, 3),
        "unit": "images/sec/chip",
        "ms_per_step": round(ms_per_step, 1),
        "iters": iters,  # how many steps the figure averages
        "vs_baseline": round(vs, 3) if vs else None,
    }
    if provisional:
        # serial 1-step reading incl. the relay fetch round trip
        rec["provisional"] = True
    print(json.dumps(rec), flush=True)


def main():
    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.models.bev_height import BEVHeight
    from sgv3d_tpu.train.loop import create_train_state, make_train_step
    from sgv3d_tpu.train.optim import make_optimizer

    cfg = get_exp(EXP)
    # 0/empty means "exact" (disabled) — a top-0 lift would be degenerate.
    topk = int(os.environ.get("BENCH_TRAIN_TOPK") or 0)
    if topk > 0:
        import dataclasses
        cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
            cfg.backbone, train_lift_top_k=topk))
    on_tpu = jax.devices()[0].platform != "cpu"
    model = BEVHeight(cfg, dtype=jnp.bfloat16 if on_tpu else None)
    imgs, mats, gt_boxes, gt_labels, gt_semantic = make_batch(
        cfg, batch=BATCH, num_objs=8)
    tx, _ = make_optimizer(cfg, 1, steps_per_epoch=100)
    state = create_train_state(
        model, cfg, tx,
        (imgs[:1], {k: v[:1] for k, v in mats.items()}))
    # donate=True matches runner.train (the state buffers are reused in
    # place instead of copied every step)
    step = make_train_step(model, cfg, tx, mesh=None, donate=True)

    jb = (jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
          jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
          jnp.asarray(gt_semantic))
    fence(jb[0])  # materialise the batch on device

    # Not a driver entry point (the driver runs bench.py only), so the
    # default is sized for a hand/judge run: the budget is anchored at
    # process start and the TPU jax import alone costs ~2 min.
    budget = Budget("BENCH_TRAIN_DEADLINE_S", 900.0)
    # Warmup/compile; the first fetch of a new output path through the axon
    # relay can take minutes, so fence twice before timing. The second
    # warmup doubles as a provisional serial measurement.
    state, metrics = step(state, *jb)
    fence(metrics["total_loss"])
    t0 = time.perf_counter()
    state, metrics = step(state, *jb)
    fence(metrics["total_loss"])
    serial_s = time.perf_counter() - t0
    _emit(serial_s * 1000.0, 1, provisional=True)

    # Steady-state measure: the state chain (state_i feeds step i+1) forces
    # sequential execution on device, so dispatch every step and fence ONCE
    # on the final loss — a real training loop doesn't fetch metrics every
    # step, and fencing per step would bill ITERS relay round-trips as if
    # they were compute. Fit the loop to the measured per-step cost (the
    # serial reading just taken is a pessimistic upper bound per step, so
    # remaining/serial_s steps always fit; code review r5): a blind halving
    # could still overrun under relay/CPU contention (CLAUDE.md landmine 7).
    affordable = int(max(0.0, budget.remaining() - 30.0) / max(serial_s, 1e-3))
    iters = max(1, min(ITERS, affordable))
    if iters < ITERS:
        print(f"# budget: measuring {iters}/{ITERS} steps "
              f"(remaining {budget.remaining():.0f}s, "
              f"serial step {serial_s:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, *jb)
    fence(metrics["total_loss"])
    dt = time.perf_counter() - t0
    _emit(dt / iters * 1000.0, iters)


if __name__ == "__main__":
    main()
