#!/usr/bin/env python
"""Roofline part 2: can conv-as-matmul beat XLA's conv lowering?

Tests: 1x1 conv vs reshape+matmul; 3x3 conv vs 9-shifted-matmul sum vs
im2col-concat matmul. All bf16 in / fp32 accum, x8 chained to amortise the
~28 ms fetch/dispatch fence of this relay.

Run: python tools/roofline2.py
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


def conv_xla(x, w, stride=1):
    kk = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(kk // 2, kk // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def conv1x1_mm(x, w):
    b, h, ww, c = x.shape
    co = w.shape[-1]
    out = jnp.dot(x.reshape(b * h * ww, c), w.reshape(c, co),
                  preferred_element_type=jnp.float32)
    return out.reshape(b, h, ww, co).astype(jnp.bfloat16)


def conv3x3_shiftmm(x, w):
    b, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, c))
            r = jnp.dot(xs.reshape(-1, c), w[dy, dx],
                        preferred_element_type=jnp.float32)
            out = r if out is None else out + r
    return out.reshape(b, h, ww, co).astype(jnp.bfloat16)


def conv3x3_im2col(x, w):
    b, h, ww, c = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, c))
         for dy in range(3) for dx in range(3)], axis=-1)
    out = jnp.dot(cols.reshape(-1, 9 * c), w.reshape(9 * c, co),
                  preferred_element_type=jnp.float32)
    return out.reshape(b, h, ww, co).astype(jnp.bfloat16)


def chain(f, n=8):
    def g(x, w):
        for _ in range(n):
            x = f(x, w)
        return x
    return g


def main():
    key = jax.random.PRNGKey(0)

    # --- 1x1 conv vs matmul (bottleneck shapes) ---
    for (bt, h, w_, cin, cout, name) in [
        (8, 54, 96, 1024, 256, "1x1 1024->256 @54x96 (r101 st3)"),
        (8, 108, 192, 512, 128, "1x1 512->128 @108x192"),
    ]:
        x = jax.random.normal(key, (bt, h, w_, cin), jnp.bfloat16)
        wc = jax.random.normal(key, (1, 1, cin, cout), jnp.bfloat16)
        wm = wc.reshape(cin, cout)
        flops = 2 * bt * h * w_ * cin * cout
        timeit(f"{name} XLA conv", conv_xla, flops, x, wc)
        timeit(f"{name} matmul", conv1x1_mm, flops, x, wm)
        # chained (cout != cin so chain needs square): skip chain here

    # square 1x1 for chaining
    bt, h, w_, c = 8, 54, 96, 512
    x = jax.random.normal(key, (bt, h, w_, c), jnp.bfloat16)
    wc = jax.random.normal(key, (1, 1, c, c), jnp.bfloat16)
    flops = 2 * bt * h * w_ * c * c
    timeit("1x1 512->512 @54x96 XLA conv x8", chain(conv_xla), 8 * flops, x, wc)
    timeit("1x1 512->512 @54x96 matmul x8",
           chain(lambda x, w: conv1x1_mm(x, w.reshape(c, c))), 8 * flops, x, wc)

    # --- 3x3 conv formulations ---
    for (bt, h, w_, c, name) in [
        (8, 108, 192, 256, "3x3 256 @108x192"),
        (8, 54, 96, 512, "3x3 512 @54x96"),
        (8, 216, 384, 64, "3x3 64 @216x384"),
        (8, 128, 128, 160, "3x3 160 @128x128"),
    ]:
        x = jax.random.normal(key, (bt, h, w_, c), jnp.bfloat16)
        wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
        flops = 8 * 2 * bt * h * w_ * c * c * 9
        timeit(f"{name} XLA conv x8", chain(conv_xla), flops, x, wgt)
        timeit(f"{name} shift-mm x8", chain(conv3x3_shiftmm), flops, x, wgt)
        timeit(f"{name} im2col x8", chain(conv3x3_im2col), flops, x, wgt)


if __name__ == "__main__":
    main()
