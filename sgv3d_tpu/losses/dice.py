"""Dice loss (the simple inline variant each reference exp defines:
/root/reference/exps/sgv3d/...r50...py:183-193)."""
from __future__ import annotations

import jax.numpy as jnp


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1e-5) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    intersection = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target)
    return 1.0 - (2.0 * intersection + smooth) / (union + smooth)
