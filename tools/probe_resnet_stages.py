"""Per-stage ResNet-101 bottleneck timing on TPU: where do the conv ms go?

Each r101 identity bottleneck costs the same FLOPs per image at every stage
(channels double as spatial quarters), so timing a K-chain of identity
blocks per stage shows XLA's conv efficiency per activation shape and tells
us which stages a fused Pallas bottleneck kernel should target.

Relay timing rules (CLAUDE.md): chain K dependent applies inside ONE jit,
fetch a scalar reduction once, 2 warmup fetches, divide by K.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sgv3d_tpu.nn.resnet import Bottleneck  # noqa: E402

BATCH = 16
K = 8

# (stage name, spatial, planes): identity-block input is (H, W, 4*planes)
STAGES = [
    ("layer1 216x384 c256", (216, 384), 64),
    ("layer2 108x192 c512", (108, 192), 128),
    ("layer3  54x96 c1024", (54, 96), 256),
    ("layer4  27x48 c2048", (27, 48), 512),
]


def time_stage(name, hw, planes, batch=BATCH, k=K):
    h, w = hw
    c = planes * 4
    block = Bottleneck(planes, 1, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, h, w, c), jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, False)

    @jax.jit
    def chain(variables, x):
        for _ in range(k):
            x = block.apply(variables, x, False)
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(chain(variables, x))  # compile + path warmup
    np.asarray(chain(variables, x))
    t0 = time.perf_counter()
    np.asarray(chain(variables, x))
    dt = time.perf_counter() - t0
    per_block = dt / k
    flops = batch * h * w * 2 * (2 * c * planes + 9 * planes * planes)
    print(f"{name}: {per_block * 1e3:7.2f} ms/block "
          f"({flops / per_block / 1e12:6.1f} TFLOP/s)  "
          f"[chain {dt * 1e3:.1f} ms]")
    return per_block


def time_stage_fused(name, hw, planes, batch=BATCH, k=K):
    from sgv3d_tpu.ops.pallas_bottleneck import (
        fold_bottleneck_params, fused_bottleneck_stack)
    h, w = hw
    c = planes * 4
    block = Bottleneck(planes, 1, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, h, w, c), jnp.bfloat16)
    variables = block.init({"params": jax.random.PRNGKey(0)}, x, False)
    fw = fold_bottleneck_params(variables["params"],
                                variables["batch_stats"])

    @jax.jit
    def chain(fw, x):
        x = fused_bottleneck_stack(x, [fw] * k)
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(chain(fw, x))
    np.asarray(chain(fw, x))
    t0 = time.perf_counter()
    np.asarray(chain(fw, x))
    dt = time.perf_counter() - t0
    per_block = dt / k
    flops = batch * h * w * 2 * (2 * c * planes + 9 * planes * planes)
    print(f"{name} FUSED: {per_block * 1e3:7.2f} ms/block "
          f"({flops / per_block / 1e12:6.1f} TFLOP/s)  "
          f"[chain {dt * 1e3:.1f} ms]")
    return per_block


def main():
    import sys
    print(f"batch={BATCH} chain K={K} identity bottlenecks, bf16, "
          f"device={jax.devices()[0].platform}")
    fused_only = "fused" in sys.argv[1:]
    for name, hw, planes in STAGES:
        if not fused_only:
            time_stage(name, hw, planes)
        time_stage_fused(name, hw, planes)


if __name__ == "__main__":
    main()
