#!/usr/bin/env python
"""Micro-roofline for this TPU chip: peak matmul and conv rates.

Establishes what fraction of peak the model's convs actually get, so conv
optimisation effort is spent only if there's real headroom.

Run: python tools/roofline.py
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
    np.asarray(reduced(*args))
    np.asarray(reduced(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(reduced(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:8.2f} ms  {flops / dt / 1e12:7.1f} TFLOP/s",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # Peak matmul (bf16): 8192^3
    m = 8192
    a = jax.random.normal(key, (m, m), jnp.bfloat16)
    b = jax.random.normal(key, (m, m), jnp.bfloat16)
    timeit("matmul 8192^3 bf16", lambda a, b: a @ b, 2 * m**3, a, b)
    # 16x amortised: loop 16 matmuls to hide the single fetch fence
    def mm16(a, b):
        out = a
        for _ in range(16):
            out = out @ b
        return out
    timeit("matmul 8192^3 bf16 x16 chained", mm16, 16 * 2 * m**3, a, b)

    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    timeit("matmul 8192^3 fp32-default", lambda a, b: a @ b, 2 * m**3, af, bf)

    # Conv shapes from the model (NHWC, bf16)
    for (bt, h, w, cin, cout, kk, name) in [
        (8, 108, 192, 256, 256, 3, "conv3x3 256->256 @108x192 (r101 st2)"),
        (8, 54, 96, 512, 512, 3, "conv3x3 512->512 @54x96"),
        (8, 216, 384, 64, 64, 3, "conv3x3 64->64 @216x384 (r101 st1)"),
        (8, 128, 128, 160, 160, 3, "conv3x3 160->160 @128x128 (bev head)"),
        (8, 432, 768, 3, 64, 7, "conv7x7s2 3->64 @864x1536 (stem)"),
    ]:
        stride = 2 if kk == 7 else 1
        hin = h * stride if kk == 7 else h
        win = w * stride if kk == 7 else w
        x = jax.random.normal(key, (bt, hin, win, cin), jnp.bfloat16)
        wgt = jax.random.normal(key, (kk, kk, cin, cout), jnp.bfloat16)
        flops = 2 * bt * h * w * cout * cin * kk * kk

        def conv(x, wgt, stride=stride, kk=kk):
            return jax.lax.conv_general_dilated(
                x, wgt, (stride, stride),
                [(kk // 2, kk // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        timeit(name, conv, flops, x, wgt)

        # 8-layer chain to amortise the fetch fence
        if kk == 3 and cin == cout:
            def chain(x, wgt):
                for _ in range(8):
                    x = conv(x, wgt)
                return x
            timeit("  x8 chained", chain, 8 * flops, x, wgt)


if __name__ == "__main__":
    main()
