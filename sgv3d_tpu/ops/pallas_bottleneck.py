"""Pallas TPU kernel: fused ResNet identity-bottleneck stack (serving path).

Why: XLA compiles each conv of a bottleneck (1x1 -> 3x3 -> 1x1 + residual)
as a separate HBM->HBM op, so every identity block moves ~5 full activation
tensors through HBM while the MXU waits (the perf ledger's "~43 TFLOP/s conv
ceiling" for large maps). This kernel runs the WHOLE block — both 1x1
matmuls, the 3x3 as nine shifted matmuls, folded BatchNorm, ReLUs and the
residual add — on a VMEM-resident spatial tile: the input tile is read from
HBM once and the output written once. Chained across a stage's identity run
in padded-H space (pad once per stage, not per block), per-block HBM traffic
drops ~2.5x and the matmuls are large, aligned MXU work.

Serving-only (inference): BatchNorm is folded into the conv weights
(`fold_bottleneck_params`), so there is no VJP. Training keeps the XLA path.

MEASURED AND CLOSED (round 3, v5e): the kernel LOSES to XLA's native conv
lowering at every r101 stage (tools/probe_resnet_stages.py, batch 16,
ms/block fused vs XLA): layer1 9.23 vs 7.37, layer2 5.77 vs 4.55, layer3
5.91 vs 5.81, layer4 4.50 vs 4.14; e2e bench 72.4 vs 78.1 img/s. The nine
shifted matmuls reach only ~20-41 TFLOP/s — the same "conv-as-matmul
memory amplification" penalty the perf ledger records for the 9-shift-sum
XLA reformulation — so the ~2.5x HBM-traffic saving never pays for the
lost MXU efficiency (XLA's conv lowering pipelines its own HBM traffic
well enough). Kept opt-in (`fused_convs=True` / BENCH_FUSED_CONVS=1),
parity-tested, default-off everywhere.

Reference context: torchvision/mmdet ResNet bottleneck used by
/root/reference/exps/sgv3d/...r50...py:54-61 (mmdet `ResNet` conf); the
math matches `sgv3d_tpu.nn.resnet.Bottleneck` with `use_running_average`.

Layout: NHWC (B, H, W, C), C = 4P. The stack operates on an H-padded
(B, H+2, W, C) tensor whose edge rows are zero; each block's kernel re-zeroes
the edge rows of its output so blocks chain without re-padding. The W axis is
unpadded — the nine 3x3 taps handle the W border by shifting with zero-fill.
"""
from __future__ import annotations

import functools
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bottleneck_params(params: Mapping[str, Any],
                           batch_stats: Mapping[str, Any],
                           eps: float = 1e-5) -> dict:
    """Fold inference BatchNorm into conv weights for one identity block.

    `params` / `batch_stats` are one `nn.resnet.Bottleneck` subtree (keys
    conv1/bn1/conv2/bn2/conv3/bn3). Returns bf16 weights + fp32 biases:
    w1 (C, P), w2 (9, P, P) in (dy, dx) row-major tap order, w3 (P, C),
    b1/b2 (1, P), b3 (1, C).
    """
    def fold(conv_name, bn_name):
        kernel = params[conv_name]["kernel"]
        g = params[bn_name]["scale"]
        b = params[bn_name]["bias"]
        m = batch_stats[bn_name]["mean"]
        v = batch_stats[bn_name]["var"]
        k = (g / jnp.sqrt(v + eps)).astype(jnp.float32)
        return (kernel.astype(jnp.float32) * k,
                (b - m * k).astype(jnp.float32))

    w1, b1 = fold("conv1", "bn1")
    w2, b2 = fold("conv2", "bn2")
    w3, b3 = fold("conv3", "bn3")
    c, p = w1.shape[2], w1.shape[3]
    return {
        "w1": w1.reshape(c, p).astype(jnp.bfloat16),
        "b1": b1.reshape(1, p),
        "w2": w2.reshape(9, p, p).astype(jnp.bfloat16),
        "b2": b2.reshape(1, p),
        "w3": w3.reshape(p, c).astype(jnp.bfloat16),
        "b3": b3.reshape(1, c),
    }


def _pick_tile_h(h: int, max_tile: int = 18) -> int:
    """Largest divisor of h that is <= max_tile (so tiles cover h exactly)."""
    for th in range(min(h, max_tile), 0, -1):
        if h % th == 0:
            return th
    return 1


def _kernel(th: int, n_h: int,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, x_hbm,
            out_hbm, xt, yt, zrow, in_sem, out_sem, z_sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    tile_w = xt.shape[1]
    c = xt.shape[2]
    p = w1_ref.shape[1]

    # Input tile: rows [i*th, i*th + th + 2) of the H-padded input — the
    # one-row halo each side that the 3x3 taps need.
    cp_in = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2)], xt, in_sem)
    cp_in.start()
    cp_in.wait()

    xv = xt[...]                                     # (th+2, W, C) bf16
    y1 = jnp.dot(xv.reshape((th + 2) * tile_w, c), w1_ref[...],
                 preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 + b1_ref[...], 0.0)
    y1 = y1.astype(jnp.bfloat16).reshape(th + 2, tile_w, p)
    # conv2's zero padding lives in y1-space: at the image's top/bottom edge
    # the halo row of x is zero, but relu(0 @ w1 + b1) = relu(b1) != 0 — the
    # 3x3 taps must see exactly zero there.
    row = jax.lax.broadcasted_iota(jnp.int32, y1.shape, 0)
    edge = ((row == 0) & (i == 0)) | ((row == th + 1) & (i == n_h - 1))
    y1 = jnp.where(edge, jnp.bfloat16(0), y1)

    # 3x3 conv as nine shifted (th*W, P) x (P, P) matmuls accumulated fp32.
    acc = jnp.zeros((th * tile_w, p), jnp.float32)
    zcol = jnp.zeros((th, 1, p), jnp.bfloat16)
    for dy in range(3):
        s_dy = y1[dy:dy + th]                        # (th, W, P)
        for dx in range(3):
            if dx == 0:      # tap needs x[w-1]: shift right, zero col 0
                s = jnp.concatenate([zcol, s_dy[:, :-1]], axis=1)
            elif dx == 2:    # tap needs x[w+1]: shift left, zero col W-1
                s = jnp.concatenate([s_dy[:, 1:], zcol], axis=1)
            else:
                s = s_dy
            acc += jnp.dot(s.reshape(th * tile_w, p), w2_ref[3 * dy + dx],
                           preferred_element_type=jnp.float32)
    y2 = jnp.maximum(acc + b2_ref[...], 0.0).astype(jnp.bfloat16)

    y3 = jnp.dot(y2, w3_ref[...], preferred_element_type=jnp.float32)
    res = xv[1:th + 1].reshape(th * tile_w, c).astype(jnp.float32)
    out = jnp.maximum(y3 + b3_ref[...] + res, 0.0)
    yt[...] = out.astype(jnp.bfloat16).reshape(th, tile_w, c)

    cp_out = pltpu.make_async_copy(
        yt, out_hbm.at[b, pl.ds(1 + i * th, th)], out_sem)
    cp_out.start()
    cp_out.wait()

    # Keep the padded layout's invariant: edge rows of the output are zero
    # (the next chained block reads them as its halo).
    zrow[...] = jnp.zeros(zrow.shape, jnp.bfloat16)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(zrow, out_hbm.at[b, pl.ds(0, 1)], z_sem)
        cp.start()
        cp.wait()

    @pl.when(i == n_h - 1)
    def _():
        cp = pltpu.make_async_copy(
            zrow, out_hbm.at[b, pl.ds(n_h * th + 1, 1)], z_sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fused_block(xp: jnp.ndarray, fw: Mapping[str, jnp.ndarray], th: int,
                 interpret: bool = False) -> jnp.ndarray:
    b, hp, w, c = xp.shape
    n_h = (hp - 2) // th
    p = fw["w1"].shape[1]
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, th, n_h),
        grid=(b, n_h),
        in_specs=[vmem] * 6 + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w, c), jnp.bfloat16),
            pltpu.VMEM((th, w, c), jnp.bfloat16),
            pltpu.VMEM((1, w, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # The fp32 matmul temporaries exceed the default 16 MB scoped-VMEM
        # limit at the large-W stages; v5e has 128 MB of VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(fw["w1"], fw["b1"], fw["w2"], fw["b2"], fw["w3"], fw["b3"], xp)


def fused_bottleneck_stack(x: jnp.ndarray,
                           blocks: Sequence[Mapping[str, jnp.ndarray]],
                           interpret: bool | None = None) -> jnp.ndarray:
    """Apply a run of folded identity bottlenecks (see module docstring).

    Args:
      x: (B, H, W, C) activations, any float dtype (computed in bf16).
      blocks: per-block folded weights from `fold_bottleneck_params`,
        applied in order. All must share x's channel count C = 4P.
      interpret: None = auto (compiled on TPU, interpreter elsewhere).

    Returns:
      (B, H, W, C) bf16.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, h, _, _ = x.shape
    th = _pick_tile_h(h)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (0, 0), (0, 0)))
    for fw in blocks:
        xp = _fused_block(xp, fw, th, interpret)
    return xp[:, 1:h + 1]
