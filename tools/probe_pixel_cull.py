"""Probe: static-rig pixel culling of the serving lift (top-k + scatter).

Idea: for a fixed roadside rig, some image pixels' ENTIRE height-bin ray
lands outside the BEV grid (sky above the horizon, road beyond the range) —
on the synthetic bench rig 18.5% of r101 pixels / 13% of BSM stride-8 pixels
are fully-trash (every one of their D cells is the trash index). The top-k
selection and the scatter are ROW-bound (CLAUDE.md perf ledger), so with the
per-rig cell cache (api.BEVHeightPredictor(static_rig=True)) those pixels
could be statically dropped before the lift: gather hp/ctx rows down to the
valid-pixel subset (a cheap row gather at PIXEL granularity, D x fewer rows
than the scatter it shrinks), run top-k + lift_splat_pool on the subset.
Culling preserves row order, so the scatter's per-cell accumulation order —
and hence the result — is bit-identical.

Measured here: the lift stage (top-k + pool) culled vs unculled at serving
scale. Timing is chained x8 inside one jit per fetch to stay above the
~28 ms relay fetch floor (CLAUDE.md landmine 1); every per-instance input is
perturbed by the carry so XLA cannot hoist the recurring gathers out of the
chain, and only the scalar carry leaves the device.

Result (v5e, r5): see PIXEL_CULL.json / the CLAUDE.md perf ledger.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sgv3d_tpu.configs import get_exp
from sgv3d_tpu.data.synthetic import make_batch
from sgv3d_tpu.nn.lss_fpn import compute_lift_cells
from sgv3d_tpu.ops.voxel_pooling import (
    cull_static_cells, lift_splat_pool, topk_lift_inputs_hwd)

CHAIN = int(os.environ.get("PC_CHAIN", "8"))
BN = int(os.environ.get("PC_BN", "16"))
EXPS = os.environ.get("PC_EXPS", "bevheight_dair_r101_128,sgv3d_r50_128")


def fetch(x):
    return np.asarray(jax.device_get(x))


def time_fn(fn, *args, iters=3):
    fetch(fn(*args))  # compile + path warmup
    fetch(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1000.0  # ms per chained instance


def _merge_artifact(new_results):
    """Merge this run's records into PIXEL_CULL.json by exp name, written
    incrementally so a killed run still persists completed exps and a
    partial-exp run (PC_EXPS=...) does not clobber the other families'
    records or the e2e section."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PIXEL_CULL.json")
    doc = {}
    try:
        with open(path) as f:
            doc = json.load(f)
    except Exception:
        pass
    by_exp = {r["exp"]: r for r in doc.get("results", [])}
    by_exp.update({r["exp"]: r for r in new_results})
    doc.setdefault(
        "note", "static-rig pixel culling of the serving lift "
        "(chained x8, min-of-3, ms per lift)")
    doc["results"] = list(by_exp.values())
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def main():
    results = []
    for exp in EXPS.split(","):
        bn = BN
        cfg = get_exp(exp)
        k = cfg.backbone.lift_top_k
        d = cfg.backbone.num_height_bins
        f_h, f_w = cfg.backbone.feat_hw
        hw = f_h * f_w
        c = cfg.backbone.output_channels + (
            cfg.backbone.semantic_channels if cfg.backbone.is_bsm else 0)
        grid = cfg.backbone.voxel_grid
        num_cells = int(grid.voxel_num[0]) * int(grid.voxel_num[1])

        # realistic per-rig cells from the synthetic calibration
        _, mats, *_ = make_batch(cfg, batch=1, num_objs=4)
        jm = {kk: jnp.asarray(v) for kk, v in mats.items()}
        cells1 = np.asarray(jax.jit(
            lambda m: compute_lift_cells(cfg.backbone, m))(jm))  # (1, HW, D)
        cells = np.broadcast_to(cells1, (bn, hw, d)).copy()

        # the production culling implementation (unit-tested contract)
        culled = cull_static_cells(cells, num_cells)
        assert culled is not None, f"{exp}: rig produced no cullable pixels"
        cells_cull, pix_keep = culled
        keep = np.where((cells1[0] < num_cells).any(axis=-1))[0]
        hw_v = len(pix_keep)

        rng = np.random.default_rng(0)
        hp = jax.nn.softmax(jnp.asarray(
            rng.normal(size=(bn, hw, d)).astype(np.float32)), axis=-1)
        ctx = jnp.asarray(rng.normal(size=(bn, hw, c)).astype(np.float32))
        jcells = jnp.asarray(cells)
        jcells_cull = jnp.asarray(cells_cull)
        jpix = jnp.asarray(pix_keep)

        def full_once(hp_i, ctx_i):
            h, cl = topk_lift_inputs_hwd(hp_i, jcells, k)
            return lift_splat_pool(h, ctx_i, cl, bn, num_cells)

        def culled_once(hp_i, ctx_i):
            hp_v = jnp.take(hp_i, jpix, axis=1)
            ctx_v = jnp.take(ctx_i, jpix, axis=1)
            h, cl = topk_lift_inputs_hwd(hp_v, jcells_cull, k)
            return lift_splat_pool(h, ctx_v, cl, bn, num_cells)

        def chain(once):
            # Perturb BOTH inputs by the carry: every instance's gathers and
            # lifts then depend on the previous instance, so nothing hoists
            # and the chain stays serialized. Only the carry leaves the loop.
            @jax.jit
            def run(hp, ctx):
                def body(carry, _):
                    out = once(hp + carry * 1e-12, ctx + carry * 1e-12)
                    return jnp.sum(out[0, 0, :1]), None
                carry, _ = jax.lax.scan(body, 0.0, None, length=CHAIN)
                return carry
            return run

        # On-device equivalence check (fetching two (BN, cells, C) maps
        # through the relay costs ~100 MB at ~25 MB/s; scalars do not).
        # Measured on-chip (r5): the top-k SELECTION (values and cells) is
        # bit-identical on every kept pixel, and the BEV maps differ only by
        # fp32 scatter summation order (max |delta| 1.2e-6 — XLA's scatter
        # reassociates differently at different row counts; the reference's
        # CUDA atomicAdd is summation-order-nondeterministic outright). On
        # the CPU backend the scatter stays in-order and the result is
        # bitwise identical (tests/test_pixel_cull.py).
        n_valid = len(keep)

        @jax.jit
        def check(hp, ctx):
            ha, ca = topk_lift_inputs_hwd(hp, jcells, k)
            a = lift_splat_pool(ha, ctx, ca, bn, num_cells)
            hp_v = jnp.take(hp, jpix, axis=1)
            ctx_v = jnp.take(ctx, jpix, axis=1)
            hb, cb = topk_lift_inputs_hwd(hp_v, jcells_cull, k)
            b = lift_splat_pool(hb, ctx_v, cb, bn, num_cells)
            # (N, k, HW*) -> (N, HW*, k); compare kept pixels via row gather
            ha_k = jnp.take(ha.transpose(0, 2, 1), jpix[:n_valid], axis=1)
            ca_k = jnp.take(ca.transpose(0, 2, 1), jpix[:n_valid], axis=1)
            topk_same = jnp.logical_and(
                jnp.array_equal(ha_k, hb.transpose(0, 2, 1)[:, :n_valid]),
                jnp.array_equal(ca_k, cb.transpose(0, 2, 1)[:, :n_valid]))
            return topk_same, jnp.max(jnp.abs(a - b)), jnp.array_equal(a, b)

        ts, bd, bb = check(hp, ctx)
        topk_same = bool(fetch(ts))
        bev_delta = float(fetch(bd))
        bev_bitwise = bool(fetch(bb))
        t_full = time_fn(chain(full_once), hp, ctx)
        t_cull = time_fn(chain(culled_once), hp, ctx)
        rec = {
            "exp": exp, "bn": bn, "hw": hw, "hw_valid": int(len(keep)),
            "hw_bucketed": hw_v, "k": k,
            "trash_pixel_frac": round(1.0 - len(keep) / hw, 4),
            "topk_selection_identical": topk_same,
            "bev_bitwise_equal": bev_bitwise,
            "bev_max_abs_delta": bev_delta,
            "lift_ms_full": round(t_full, 3),
            "lift_ms_culled": round(t_cull, 3),
            "lift_speedup": round(t_full / t_cull, 4),
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        _merge_artifact(results)
        assert topk_same, f"culled top-k selection differs for {exp}"
        assert bev_delta < 1e-5, (
            f"culled BEV beyond scatter-order noise for {exp}: {bev_delta}")


if __name__ == "__main__":
    main()
