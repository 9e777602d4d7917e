"""Bilinear resize with both torch alignment conventions.

`align_corners=False` delegates to jax.image.resize (half-pixel centers, the
torch default). `align_corners=True` is implemented as two separable
interpolation matmuls (MXU-friendly) matching torch's corner-aligned grid —
needed for ASPP parity (/root/reference/layers/backbones/lss_fpn.py:101-104).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) corner-aligned linear interpolation matrix."""
    A = np.zeros((dst, src), np.float32)
    if dst == 1 or src == 1:
        A[:, 0] = 1.0
        return A
    pos = np.arange(dst) * (src - 1) / (dst - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = (pos - lo).astype(np.float32)
    A[np.arange(dst), lo] += 1.0 - frac
    A[np.arange(dst), hi] += frac
    return A


def resize_bilinear(x: jnp.ndarray, scale: float | None = None,
                    size: tuple[int, int] | None = None,
                    align_corners: bool = False) -> jnp.ndarray:
    """Resize NHWC (or HWC) tensor bilinearly.

    Args:
      x: (..., H, W, C).
      scale: uniform scale factor (exclusive with size).
      size: target (H, W).
      align_corners: torch convention flag.
    """
    h, w = x.shape[-3], x.shape[-2]
    if size is None:
        assert scale is not None
        size = (int(h * scale), int(w * scale))
    out_h, out_w = size
    if (out_h, out_w) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(
            x, x.shape[:-3] + (out_h, out_w, x.shape[-1]), method="bilinear")
    Ah = jnp.asarray(_interp_matrix(h, out_h))
    Aw = jnp.asarray(_interp_matrix(w, out_w))
    x32 = x.astype(jnp.float32)
    out = jnp.einsum("oh,...hwc->...owc", Ah, x32)
    out = jnp.einsum("pw,...owc->...opc", Aw, out)
    return out.astype(x.dtype)
