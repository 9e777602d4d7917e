"""Focal losses for the semantic mask heads.

Parity targets: /root/reference/losses/_functional.py:36-99 (binary focal on
logits with alpha balancing, mean reduction) and /root/reference/losses/
focal.py:71-90 (multiclass = sum over classes of one-vs-all binary focal).
The SGV3D exps use mode='multiclass', alpha=0.25, gamma=2, reduction='mean'
(/root/reference/exps/sgv3d/...r50...py:249).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def binary_focal_loss_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                                  gamma: float = 2.0,
                                  alpha: float | None = 0.25) -> jnp.ndarray:
    """Mean binary focal loss on logits."""
    targets = targets.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    # Stable BCE-with-logits: max(x,0) - x*t + log(1 + exp(-|x|))
    logpt = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    pt = jnp.exp(-logpt)
    loss = jnp.power(1.0 - pt, gamma) * logpt
    if alpha is not None:
        loss = loss * (alpha * targets + (1.0 - alpha) * (1.0 - targets))
    return jnp.mean(loss)


def multiclass_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          gamma: float = 2.0,
                          alpha: float | None = 0.25) -> jnp.ndarray:
    """Sum over classes of one-vs-all binary focal loss.

    Args:
      logits: (..., C) class logits (channel-last).
      labels: (...) int class ids.
    """
    num_classes = logits.shape[-1]
    total = jnp.float32(0.0)
    for cls in range(num_classes):
        total = total + binary_focal_loss_with_logits(
            logits[..., cls], (labels == cls).astype(jnp.float32),
            gamma=gamma, alpha=alpha)
    return total
