"""Host-CPU jax-backend helpers for the serving path.

The static-rig pixel cull needs one (HW,) validity mask per rig. Computing
it on the accelerator means a device->host fetch, and fetching ANYTHING
through the axon TPU relay can cost minutes on a cold path (CLAUDE.md
landmine 1 — measured 665 s for 20 KB of bools at BSM scale, r5). The mask
is pure camera geometry, so it runs on the host CPU backend from the
host-side calibration in ~a second instead, with a conservative 1-voxel
margin making the decision robust to CPU-vs-TPU fp32 rounding
(`nn.lss_fpn.compute_valid_pixels`).
"""
from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _valid_fn(backbone_cfg, margin: int):
    """One jitted CPU validity function per (frozen) backbone config —
    recreating the lambda per call would re-trace/compile the geometry on
    every new-rig cache miss (code review r5)."""
    import jax

    from sgv3d_tpu.nn.lss_fpn import compute_valid_pixels

    return jax.jit(lambda m: compute_valid_pixels(
        backbone_cfg, m, margin=margin).any(axis=0))


def host_valid_pixels(backbone_cfg, host_mats, margin: int = 1):
    """(HW,) bool batch-union validity mask, computed on the CPU backend.

    `host_mats`: the host-side (numpy) mats dict. Returns None when no CPU
    backend is available (never the case on standard jax builds) — callers
    then skip culling rather than risk a device fetch.
    """
    import jax

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return None
    mats_np = {k: np.asarray(v) for k, v in host_mats.items()}
    # A serving batch usually replicates ONE rig B times; compute geometry
    # only for the unique batch elements and union — on the 1-core host
    # this cuts the prep by ~the batch factor (code review r5). Mixed-rig
    # batches keep full union semantics via the unique set.
    batch = next(iter(mats_np.values())).shape[0]
    keys = [
        tuple(mats_np[k][i].tobytes() for k in sorted(mats_np))
        for i in range(batch)
    ]
    uniq = sorted({keys.index(k) for k in keys})
    mats_u = {k: v[uniq] for k, v in mats_np.items()}
    with jax.default_device(cpu):
        valid = _valid_fn(backbone_cfg, margin)(jax.device_put(mats_u, cpu))
    return np.asarray(valid)
