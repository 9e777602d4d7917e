"""Probe: are dilated convs (ASPP, d=6/12/18) a TPU-lowering sore spot, and
does a space-to-batch reformulation help?

Times, at MSCThead shapes ((2, 54, 96, 512) bf16):
  - dense 3x3 conv (reference rate)
  - dilated 3x3 conv at d = 6 / 12 / 18 (XLA native lowering)
  - the same dilated conv via space-to-batch: split the grid into d x d
    phases (each phase sees a dense 3x3 over a (H/d, W/d) map), batch the
    phases, run ONE dense conv, interleave back. Identical math for
    'SAME'-style symmetric padding of d per side.
  - the full ASPP module fwd and fwd+bwd
Also times the MSCThead stage blocks to localise its 42 ms.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def ssum(x):
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(x))


def timeit(name, fn, *args, iters=10):
    jfn = jax.jit(lambda *a: ssum(fn(*a)))
    float(np.asarray(jax.device_get(jfn(*args))))
    float(np.asarray(jax.device_get(jfn(*args))))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(jax.device_get(jfn(*args))))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def conv(x, w, dilation=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((dilation, dilation), (dilation, dilation)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2b(x, w, d):
    """Dilated 3x3 conv via space-to-batch: pad H,W to multiples of d, split
    into d*d phase grids, dense 3x3 conv on the batched phases, reassemble."""
    n, h, wd, c = x.shape
    ph = (-h) % d
    pw = (-wd) % d
    # window reaches d beyond each edge -> pad d (+ alignment) each side
    x = jnp.pad(x, ((0, 0), (d, d + ph), (d, d + pw), (0, 0)))
    hh, ww = x.shape[1] // d, x.shape[2] // d
    # (n, hh, d, ww, d, c) -> (n, d, d, hh, ww, c) -> (n*d*d, hh, ww, c)
    x = x.reshape(n, hh, d, ww, d, c).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(n * d * d, hh, ww, c)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    co = y.shape[-1]
    y = y.reshape(n, d, d, hh, ww, co).transpose(0, 3, 1, 4, 2, 5)
    y = y.reshape(n, hh * d, ww * d, co)
    return y[:, d:d + h, d:d + wd]


def main():
    B, H, W, C = 2, 54, 96, 512
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C),
                          jnp.bfloat16) * 0.02

    # correctness of the s2b reformulation (fp32, small)
    xs = jax.random.normal(key, (1, 20, 24, 8), jnp.float32)
    ws = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 8, 8), jnp.float32)
    for d in (2, 3, 6):
        a = conv(xs, ws, d)
        b = conv_s2b(xs, ws, d)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"s2b d={d} max|err| = {err:.2e}")
        assert err < 1e-4, err

    # Single small ops sit at the ~28 ms relay round-trip floor — chain K
    # dependent convs inside one jit and divide, like tools/roofline.py.
    K = 32

    def chain(f):
        def run(x):
            def body(_, y):
                return f(y) * 0.999
            return jax.lax.fori_loop(0, K, body, x)
        return run

    base = timeit("fetch floor (x*1.0001 chained)",
                  chain(lambda y: y * 1.0001), x)

    def chained(name, f):
        dt = timeit(name, chain(f), x)
        print(f"    -> {(dt - base) / K * 1000:8.1f} us/op net", flush=True)

    chained("dense 3x3 512ch (54x96) x32", lambda y: conv(y, w, 1))
    for d in (6, 12, 18):
        chained(f"dilated 3x3 d={d} (XLA native) x32",
                lambda y, d=d: conv(y, w, d))
        chained(f"dilated 3x3 d={d} (space-to-batch) x32",
                lambda y, d=d: conv_s2b(y, w, d))

    # full ASPP module
    import flax.linen as nn

    from sgv3d_tpu.nn.blocks import ASPP

    aspp = ASPP(C, dtype=jnp.bfloat16)
    v = aspp.init({"params": jax.random.PRNGKey(0)}, x.astype(jnp.float32),
                  False)
    mut = [k for k in v if k != "params"]

    def aspp_fwd(params, x):
        out, _ = aspp.apply({**v, "params": params}, x, True, mutable=mut,
                            rngs={"dropout": jax.random.PRNGKey(0)})
        return out

    timeit("ASPP fwd (train)", aspp_fwd, v["params"], x.astype(jnp.float32))

    def aspp_fwdbwd(params, x):
        loss, grads = jax.value_and_grad(
            lambda p: ssum(aspp_fwd(p, x)))(params)
        return loss + 0.0 * ssum(grads)

    timeit("ASPP fwd+bwd", aspp_fwdbwd, v["params"], x.astype(jnp.float32))


if __name__ == "__main__":
    main()
