#!/usr/bin/env python
"""Roofline part 3: int8 conv/matmul rates on this chip.

Convs are HBM-bandwidth-bound (roofline2), so int8 activations+weights
should approach 2x bf16 if XLA lowers them to the int8 MXU path. This spike
decides whether a quantized-inference mode is worth building.

Run: python tools/roofline_int8.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, flops, *args, iters=10):
    @jax.jit
    def reduced(*a):
        return jnp.sum(fn(*a).astype(jnp.float32))
    try:
        np.asarray(reduced(*args))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(reduced(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:7.1f} T(FL)OP/s",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    m = 8192
    ai = jax.random.randint(key, (m, m), -127, 127, jnp.int8)
    bi = jax.random.randint(key, (m, m), -127, 127, jnp.int8)

    def mm16_i8(a, b):
        out = a
        for _ in range(16):
            out = jax.lax.dot(out, b, preferred_element_type=jnp.int32
                              ).astype(jnp.int8)
        return out
    timeit("matmul 8192^3 int8 x16 chained", mm16_i8, 16 * 2 * m**3, ai, bi)

    for (bt, h, w, c, name) in [
        (8, 108, 192, 256, "conv3x3 256 @108x192"),
        (8, 54, 96, 512, "conv3x3 512 @54x96"),
    ]:
        xi = jax.random.randint(key, (bt, h, w, c), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (3, 3, c, c), -127, 127, jnp.int8)
        flops = 8 * 2 * bt * h * w * c * c * 9

        def chain_i8(x, wgt):
            for _ in range(8):
                x = jax.lax.conv_general_dilated(
                    x, wgt, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32).astype(jnp.int8)
            return x
        timeit(f"{name} int8 x8", chain_i8, flops, xi, wi)

        # bf16 with int8-sized traffic comparison: fp8? try bf16 baseline
        xb = xi.astype(jnp.bfloat16)
        wb = wi.astype(jnp.bfloat16)

        def chain_bf(x, wgt):
            for _ in range(8):
                x = jax.lax.conv_general_dilated(
                    x, wgt, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return x
        timeit(f"{name} bf16 x8 (ref)", chain_bf, flops, xb, wb)


if __name__ == "__main__":
    main()
