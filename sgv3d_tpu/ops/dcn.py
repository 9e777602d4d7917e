"""Deformable convolution v1 as offset-prediction + bilinear gather.

XLA has no deform-conv primitive; on TPU the natural formulation is a dense
bilinear gather of all k*k taps followed by a grouped contraction (MXU). This
matches the math of mmcv `DeformConv2dPack` (DCNv1, no modulation): zero-init
offset conv, offset channel layout (dy, dx) per tap, zero padding outside the
feature map.

Used by HeightNet's height branch (reference conf:
/root/reference/layers/backbones/lss_fpn.py:190-198 — k=3, pad=1, groups=4).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def bilinear_sample_nhwc(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """Sample x (B, H, W, C) at float coords (B, ...,) with zero padding.

    Uses a flattened single-axis `take_along_axis` per corner — ~1.6x faster
    on TPU than the equivalent multi-dim fancy-index gather.

    Returns (B, ..., C).
    """
    b, h, w, c = x.shape
    idx_shape = py.shape
    py_f = py.reshape(b, -1)
    px_f = px.reshape(b, -1)
    xf = x.reshape(b, h * w, c)
    y0 = jnp.floor(py_f)
    x0 = jnp.floor(px_f)
    wy = py_f - y0
    wx = px_f - x0
    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            weight = jnp.abs(1.0 - dy - wy) * jnp.abs(1.0 - dx - wx)
            valid = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            idx = yi * w + xi                                  # (B, M)
            vals = jnp.take_along_axis(xf, idx[..., None], axis=1)
            contrib = vals * (weight * valid.astype(x.dtype))[..., None]
            out = contrib if out is None else out + contrib
    return out.reshape(*idx_shape, c)


def bilinear_sample_window_nhwc(x: jnp.ndarray, py: jnp.ndarray,
                                px: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample via ONE windowed gather per point (vs 4 corner gathers).

    Zero-pads x by one ring, then gathers a (2, 2, C) slice at
    (floor(py)+1, floor(px)+1) — the four bilinear corners in a single
    `lax.gather` whose slice rows are contiguous 2*C-element chunks (NHWC),
    so the TPU issues 4x fewer gather rows at 2x the DMA granularity of the
    per-corner `take_along_axis` formulation. Semantics identical to
    `bilinear_sample_nhwc` in fp32 (zero padding outside the map; corners
    one step outside read the zero ring; footprints fully outside are
    masked), bitwise-tested. In a bf16 compute dtype the corner weights and
    accumulation run in bf16 too (the per-corner variant keeps them fp32):
    a deliberate perf trade on the bf16 backbone path whose end effect is
    already bounded through the full AP pipeline by the `bf16` knob rows of
    PARITY_KNOBS.json — the parity-grade eval path is fp32 throughout.
    """
    b, h, w, c = x.shape
    idx_shape = py.shape
    py_f = py.reshape(b, -1).astype(jnp.float32)
    px_f = px.reshape(b, -1).astype(jnp.float32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y0 = jnp.floor(py_f)
    x0 = jnp.floor(px_f)
    wy = (py_f - y0).astype(x.dtype)
    wx = (px_f - x0).astype(x.dtype)
    # Footprint intersects the map iff floor coords lie in [-1, size-1].
    inside = ((y0 >= -1) & (y0 <= h - 1) & (x0 >= -1) & (x0 <= w - 1))
    starts = jnp.stack(
        [jnp.clip(y0 + 1, 0, h), jnp.clip(x0 + 1, 0, w)], axis=-1
    ).astype(jnp.int32)                                     # (B, M, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def gather_one(img, st):
        return jax.lax.gather(
            img, st, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.CLIP)            # (M, 2, 2, C)

    win = jax.vmap(gather_one)(xp, starts)                  # (B, M, 2, 2, C)
    one = jnp.ones((), x.dtype)
    m = inside.astype(x.dtype)
    w00 = (one - wy) * (one - wx) * m
    w01 = (one - wy) * wx * m
    w10 = wy * (one - wx) * m
    w11 = wy * wx * m
    wcorner = jnp.stack([w00, w01, w10, w11], -1).reshape(b, -1, 2, 2)
    out = (win * wcorner[..., None]).sum(axis=(2, 3))
    return out.reshape(*idx_shape, c)


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, weight: jnp.ndarray,
                  bias: jnp.ndarray | None = None, kernel: int = 3,
                  groups: int = 1, sampler: str = "window") -> jnp.ndarray:
    """DCNv1 forward.

    Args:
      x: (B, H, W, Cin).
      offset: (B, H, W, 2*k*k) with (dy, dx) pairs per tap, row-major taps.
      weight: (k, k, Cin // groups, Cout) flax conv layout.
      bias: optional (Cout,).
      kernel: k (padding fixed at k//2, stride 1).
      groups: conv groups.

    Returns:
      (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    k = kernel
    pad = k // 2
    taps = k * k
    cout = weight.shape[-1]

    # Coordinates in fp32: bf16 loses fractional-offset precision once the
    # base coordinate exceeds ~64 (8-bit mantissa), skewing the bilinear taps.
    hh = jnp.arange(h, dtype=jnp.float32)
    ww = jnp.arange(w, dtype=jnp.float32)
    base_y = hh[None, :, None, None]
    base_x = ww[None, None, :, None]
    tap_dy = (jnp.arange(taps) // k - pad).astype(jnp.float32)[None, None, None, :]
    tap_dx = (jnp.arange(taps) % k - pad).astype(jnp.float32)[None, None, None, :]
    off = offset.reshape(b, h, w, taps, 2).astype(jnp.float32)
    py = base_y + tap_dy + off[..., 0]
    px = base_x + tap_dx + off[..., 1]

    sample = (bilinear_sample_window_nhwc if sampler == "window"
              else bilinear_sample_nhwc)
    sampled = sample(x, py, px)                # (B, H, W, taps, Cin)
    if groups == 1:
        out = jnp.einsum("bhwtc,tcd->bhwd",
                         sampled, weight.reshape(taps, cin, cout),
                         preferred_element_type=jnp.float32)
    else:
        cg = cin // groups
        og = cout // groups
        sg = sampled.reshape(b, h, w, taps, groups, cg)
        wg = weight.reshape(k, k, cg, groups, og).transpose(0, 1, 3, 2, 4)
        wg = wg.reshape(taps, groups, cg, og)
        out = jnp.einsum("bhwtgc,tgcd->bhwgd", sg, wg,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class DeformConv(nn.Module):
    """DeformConv2dPack equivalent: zero-init offset conv + deformable conv."""
    features: int
    kernel: int = 3
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        # mmcv zero-inits the offset conv so training starts as a plain conv.
        offset = nn.Conv(
            2 * k * k, (k, k), padding=[(k // 2, k // 2)] * 2,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="offset_conv")(x)
        cin = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.he_normal(),
            (k, k, cin // self.groups, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return deform_conv2d(x, offset, weight, bias, k, self.groups)
