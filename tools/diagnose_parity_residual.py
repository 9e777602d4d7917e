#!/usr/bin/env python
"""Diagnose the 1408^2-grid parity residual (VERDICT r4 next-step #4).

`PARITY_VARIANTS.json` bevheight_rope3d_r101_140m shows 3 untied-unmatched
boxes and a 0.044 sorted-score delta — an order of magnitude above every
other family. This tool attributes each unmatched box to its mechanism:

  * nms_suppressed — the box exists bit-near in the other framework's
    PRE-NMS candidate set but a (tie-arbitrary or near-tie flipped) higher
    scored neighbour suppressed it there: a DISCRETE cascade, not numerics.
  * post_max_cut  — kept by NMS but ranked past the post_max_size slots
    (rank boundary; a sub-1e-3 score delta flips adjacent ranks).
  * topk_cut      — fell outside the per-task top-max_per_task candidate
    cut (rank boundary at the 500th score).
  * kept_but_unmatched — present and kept in both, but beyond the 5%
    match gate: would indicate a REAL numerics accumulation (none expected).

Run (CPU, fp32 — the artifact operating point; ~3 min on the 1-core host):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/diagnose_parity_residual.py

Writes the evidence into PARITY_VARIANTS.json as
families[exp]["residual_explained"].
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
sys.path.insert(0, os.path.join(_REPO, "tools"))

import jax  # noqa: E402

from parity_full import _force_cpu_fp32, _untied, parity_cfg  # noqa: E402


def _rel_delta(vec, cands):
    """Row-wise max relative delta of `cands` (N, F) against `vec` (F,)."""
    import numpy as np
    return np.max(np.abs(cands - vec[None]) / np.maximum(np.abs(vec[None]),
                                                         1.0), axis=1)


def _greedy_nms_with_blame(xy, radius):
    """Numpy mirror of decode.circle_nms over score-ordered candidates that
    also records, for every suppressed candidate, WHO suppressed it."""
    import numpy as np
    n = len(xy)
    keep = np.ones(n, bool)
    blame = np.full(n, -1, np.int64)
    r2 = float(radius) ** 2
    for i in range(n):
        if not keep[i]:
            continue
        d2 = np.sum((xy[i + 1:] - xy[i][None]) ** 2, axis=1)
        hit = np.where((d2 < r2) & keep[i + 1:])[0] + i + 1
        keep[hit] = False
        blame[hit] = i
    return keep, blame


def _unmatched_indices(ref_labels, ref_vals, got_labels, got_vals):
    """parity_full._match_sets, but returning the indices of the unmatched
    ref rows instead of just their count."""
    import numpy as np
    used = np.zeros(len(got_vals), bool)
    unmatched = []
    for i, (lab, vec) in enumerate(zip(ref_labels, ref_vals)):
        cand = np.where((got_labels == lab) & ~used)[0]
        if len(cand) == 0:
            unmatched.append(i)
            continue
        rel = _rel_delta(vec, got_vals[cand])
        if float(rel.min()) > 0.05:
            unmatched.append(i)
            continue
        used[cand[int(np.argmin(rel))]] = True
    return unmatched


def _task_of(label, ncs):
    off = 0
    for ti, nc in enumerate(ncs):
        if label < off + nc:
            return ti
        off += nc
    raise ValueError(label)


def _explain_missing(box, score, label, cfg, cand_by_task, other_name):
    """Attribute why (box, score, label) from one framework has no match in
    the other framework's kept set, using that framework's PRE-NMS
    candidates (cand_by_task[ti] = dict(boxes, scores) score-ordered)."""
    import numpy as np
    ncs = [t.num_classes for t in cfg.tasks]
    ti = _task_of(int(label), ncs)
    cands = cand_by_task[ti]
    same = np.where(cands["labels"] == label)[0]
    rec = {"score": float(score), "task": ti, "label": int(label),
           "xy": [float(box[0]), float(box[1])]}
    vec = np.concatenate([box, [score]])
    if len(same) == 0:
        rec["mechanism"] = "topk_cut"
        # the candidate set can be entirely empty for a task (all decode
        # rows invalid); there is then no cut score to measure a margin to
        if len(cands["scores"]):
            rec["margin_to_cut"] = float(score) - float(cands["scores"][-1])
        rec["evidence"] = f"no same-label candidate in {other_name} pre-NMS"
        return rec
    vals = np.concatenate([cands["boxes"][same],
                           cands["scores"][same, None]], axis=1)
    rel = _rel_delta(vec, vals)
    j = same[int(np.argmin(rel))]
    rec["pre_nms_nearest_delta"] = float(rel.min())
    if float(rel.min()) > 2e-3:
        # not bit-near pre-NMS either: candidate fell past the top-k cut
        kth = float(cands["scores"][-1])
        rec["mechanism"] = "topk_cut"
        rec["margin_to_cut"] = float(score) - kth
        rec["evidence"] = (f"nearest {other_name} pre-NMS delta "
                           f"{rel.min():.2e}; margin to {other_name}'s "
                           f"weakest kept candidate score {kth:.6f} = "
                           f"{float(score) - kth:.2e}")
        return rec
    # bit-near candidate EXISTS pre-NMS -> numerics fine; find the discrete
    # mechanism that removed it from the kept set.
    keep, blame = _greedy_nms_with_blame(
        cands["boxes"][:, :2], cfg.nms_min_radius[ti])
    if not keep[j]:
        s = int(blame[j])
        sup_score = float(cands["scores"][s])
        n_tied = int(np.sum(cands["scores"] == cands["scores"][s]))
        rec["mechanism"] = "nms_suppressed"
        rec["evidence"] = (
            f"pre-NMS twin (delta {rel.min():.1e}) suppressed in "
            f"{other_name} by candidate at rank {s} score {sup_score:.6f} "
            f"(dist {np.hypot(*(cands['boxes'][s, :2] - box[:2])):.2f} m < "
            f"radius {cfg.nms_min_radius[ti]}); suppressor score has "
            f"{n_tied} bit-equal duplicates in {other_name}'s own set"
            + (" (tie-arbitrary survivor)" if n_tied > 1 else
               " (near-tie rank flip)"))
        return rec
    rank_kept = int(np.sum(keep[:j]))
    if rank_kept >= cfg.post_max_size:
        edge = cands["scores"][keep][cfg.post_max_size - 1]
        rec["mechanism"] = "post_max_cut"
        rec["evidence"] = (
            f"pre-NMS twin (delta {rel.min():.1e}) kept by NMS at kept-rank "
            f"{rank_kept} >= post_max_size {cfg.post_max_size}; score gap "
            f"to the boundary slot {float(edge):.6f} = "
            f"{float(edge) - float(cands['scores'][j]):.2e}")
        return rec
    # The bit-near twin exists AND is kept: the unmatched count is a greedy
    # one-to-one pairing artifact — a different (tied/bit-near) box claimed
    # the twin first — not a numerics delta.
    rec["mechanism"] = "pair_stolen_by_tie"
    rec["evidence"] = (
        f"twin (delta {rel.min():.1e}) kept at kept-rank {rank_kept} in "
        f"{other_name}; greedy one-to-one matching assigned it to another "
        "box — a duplicate/near-duplicate candidate set, not a numerics "
        "delta")
    return rec


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp", default="bevheight_rope3d_r101_140m")
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--gain", type=float, default=0.8)
    parser.add_argument("--artifact",
                        default=os.path.join(_REPO, "PARITY_VARIANTS.json"))
    parser.add_argument("--final_dim", type=int, nargs=2, default=None,
                        help="smoke knob: shrink the input; the recorded "
                             "diagnosis omits this")
    parser.add_argument("--no_write", action="store_true",
                        help="print only; do not update the artifact")
    args = parser.parse_args()

    _force_cpu_fp32()
    import numpy as np
    import torch

    import jax.numpy as jnp
    from convert_weights import convert_state_dict
    from torch_oracle import (TorchBEVHeight, TorchBSMBEVHeight,
                              he_randomize_params, numpy_decode)

    from sgv3d_tpu.data.synthetic import make_batch
    from sgv3d_tpu.decode import decode
    from sgv3d_tpu.models.bev_height import BEVHeight

    cfg = parity_cfg(args.exp, final_dim=args.final_dim)
    is_bsm = cfg.backbone.is_bsm
    imgs, mats, *_ = make_batch(cfg, batch=1, num_objs=10, seed=args.seed)

    t0 = time.time()
    tm = (TorchBSMBEVHeight if is_bsm else TorchBEVHeight)(cfg).eval()
    he_randomize_params(tm, seed=7, gain=args.gain)
    with torch.no_grad():
        x = torch.tensor(imgs[:, 0, 0].transpose(0, 3, 1, 2).copy(),
                         dtype=torch.float32)
        tpreds = tm(x, mats)
    print(f"torch forward {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    model = BEVHeight(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()},
        False)
    sd = {"model." + k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    new_vars, _, _ = convert_state_dict(sd, dict(variables), strict=False,
                                        is_bsm=is_bsm)
    jpreds, _ = model.apply(new_vars, jnp.asarray(imgs),
                            {k: jnp.asarray(v) for k, v in mats.items()},
                            False)
    jpreds = jax.tree_util.tree_map(np.asarray, jpreds)
    print(f"jax init+forward {time.time() - t0:.0f}s", flush=True)

    head = cfg.head
    t_n = len(head.tasks)
    # standard decodes (the artifact's comparison)
    tdets = numpy_decode(head, tpreds)
    jdets = decode(head, [
        {k: jnp.asarray(v) for k, v in p.items()} for p in jpreds])
    tboxes, tscores, tlabels = tdets[0]
    v = np.asarray(jdets.valid[0])
    jboxes = np.asarray(jdets.boxes[0])[v]
    jscores = np.asarray(jdets.scores[0])[v]
    jlabels = np.asarray(jdets.labels[0])[v]

    # PRE-NMS candidate sets: radius 0 disables suppression (d2 < 0 never),
    # post_max = max_per_task keeps every top-k candidate.
    nonms = dataclasses.replace(
        head, nms_min_radius=tuple(0.0 for _ in head.nms_min_radius),
        post_max_size=head.max_per_task)
    jd_all = decode(nonms, [
        {k: jnp.asarray(v) for k, v in p.items()} for p in jpreds])
    pm = nonms.post_max_size

    def cand_tasks_jax():
        out = []
        for ti in range(t_n):
            sl = slice(ti * pm, (ti + 1) * pm)
            val = np.asarray(jd_all.valid[0])[sl]
            out.append({
                "boxes": np.asarray(jd_all.boxes[0])[sl][val],
                "scores": np.asarray(jd_all.scores[0])[sl][val],
                "labels": np.asarray(jd_all.labels[0])[sl][val]})
        return out

    td_all = numpy_decode(nonms, tpreds)

    def cand_tasks_torch():
        # numpy_decode returns one flat per-frame (boxes, scores, labels);
        # split per task via the global label -> task mapping, preserving
        # its score ordering.
        b, s, l = td_all[0]
        ncs = [t.num_classes for t in head.tasks]
        out = []
        for ti in range(t_n):
            off = sum(ncs[:ti])
            m = (l >= off) & (l < off + ncs[ti])
            out.append({"boxes": b[m], "scores": s[m], "labels": l[m]})
        return out

    jax_cands = cand_tasks_jax()
    torch_cands = cand_tasks_torch()

    tun = _untied(tscores)
    jun = _untied(jscores)
    tvals = np.concatenate([tboxes, tscores[:, None]], 1)
    jvals = np.concatenate([jboxes, jscores[:, None]], 1)

    findings = {"torch_missing_in_jax": [], "jax_missing_in_torch": []}
    for i in _unmatched_indices(tlabels[tun], tvals[tun],
                                jlabels[jun], jvals[jun]):
        idx = np.where(tun)[0][i]
        findings["torch_missing_in_jax"].append(_explain_missing(
            tboxes[idx], tscores[idx], tlabels[idx], head, jax_cands,
            "jax"))
    for i in _unmatched_indices(jlabels[jun], jvals[jun],
                                tlabels[tun], tvals[tun]):
        idx = np.where(jun)[0][i]
        findings["jax_missing_in_torch"].append(_explain_missing(
            jboxes[idx], jscores[idx], jlabels[idx], head, torch_cands,
            "torch"))

    mechanisms = sorted({r["mechanism"] for d in findings.values()
                         for r in d})

    def _is_discrete(r):
        """True when the miss is a discrete selection boundary (tie/NMS/
        rank cut at a sub-5e-3 score margin), not accumulated numerics."""
        if r["mechanism"] in ("nms_suppressed", "post_max_cut",
                              "pair_stolen_by_tie"):
            return True
        if r["mechanism"] == "topk_cut":
            return abs(r.get("margin_to_cut", 0.0)) < 5e-3
        return False

    summary = {
        "exp": args.exp,
        "unmatched_untied": {k: len(v) for k, v in findings.items()},
        "mechanisms": mechanisms,
        "numerics_accumulation": not all(
            _is_discrete(r) for d in findings.values() for r in d),
        "findings": findings,
    }
    print(json.dumps(summary, indent=1), flush=True)

    if args.no_write or args.final_dim is not None:
        return
    if os.path.exists(args.artifact):
        with open(args.artifact) as f:
            payload = json.load(f)
        for fam in payload.get("families", []):
            if fam.get("exp") == args.exp:
                fam["residual_explained"] = summary
        with open(args.artifact, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"updated {args.artifact}", flush=True)


if __name__ == "__main__":
    main()
