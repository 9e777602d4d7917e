"""Focal losses for the semantic mask heads.

Parity targets: /root/reference/losses/_functional.py:36-99 (binary focal on
logits with alpha balancing, mean reduction) and /root/reference/losses/
focal.py:12-90 (binary / multiclass / multilabel modes with ignore_index).
The SGV3D exps use mode='multiclass', alpha=0.25, gamma=2, reduction='mean'
(/root/reference/exps/sgv3d/...r50...py:249).

jit-safe design note: the reference filters ignored elements with boolean
indexing (dynamic shapes); here ignored elements get zero weight and the
mean divides by the kept count — identical values, static shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

from sgv3d_tpu.losses.constants import (BINARY_MODE, MULTICLASS_MODE,
                                        MULTILABEL_MODE)


def focal_loss_elements(logits: jnp.ndarray, targets: jnp.ndarray,
                        gamma: float = 2.0,
                        alpha: float | None = 0.25) -> jnp.ndarray:
    """Per-element binary focal loss on logits (no reduction)."""
    targets = targets.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    # Stable BCE-with-logits: max(x,0) - x*t + log(1 + exp(-|x|))
    logpt = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    pt = jnp.exp(-logpt)
    loss = jnp.power(1.0 - pt, gamma) * logpt
    if alpha is not None:
        loss = loss * (alpha * targets + (1.0 - alpha) * (1.0 - targets))
    return loss


def _reduce(loss: jnp.ndarray, weight: jnp.ndarray | None,
            reduction: str) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if reduction == "mean":
        if weight is not None:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(weight), 1.0)
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def binary_focal_loss_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                                  gamma: float = 2.0,
                                  alpha: float | None = 0.25,
                                  ignore_index: int | None = None,
                                  reduction: str = "mean") -> jnp.ndarray:
    """Binary focal loss on logits, mean over non-ignored elements."""
    weight = None
    if ignore_index is not None:
        weight = (targets != ignore_index).astype(jnp.float32)
    loss = focal_loss_elements(logits, targets, gamma, alpha)
    return _reduce(loss, weight, reduction)


def multiclass_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                          gamma: float = 2.0,
                          alpha: float | None = 0.25,
                          ignore_index: int | None = None,
                          reduction: str = "mean") -> jnp.ndarray:
    """Sum over classes of one-vs-all binary focal loss.

    Args:
      logits: (..., C) class logits (channel-last).
      labels: (...) int class ids.
      ignore_index: label value excluded from every per-class term
        (reference focal.py:77-88).
    """
    num_classes = logits.shape[-1]
    weight = None
    if ignore_index is not None:
        weight = (labels != ignore_index).astype(jnp.float32)
    total = jnp.float32(0.0)
    for cls in range(num_classes):
        loss = focal_loss_elements(
            logits[..., cls], (labels == cls).astype(jnp.float32),
            gamma=gamma, alpha=alpha)
        total = total + _reduce(loss, weight, reduction)
    return total


def multilabel_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                          gamma: float = 2.0,
                          alpha: float | None = 0.25,
                          ignore_index: int | None = None,
                          reduction: str = "mean") -> jnp.ndarray:
    """Multilabel mode: flatten all (element, class) pairs as binary terms
    (reference focal.py:60-70 treats multilabel identically to binary after
    the flatten)."""
    return binary_focal_loss_with_logits(
        logits, targets, gamma=gamma, alpha=alpha,
        ignore_index=ignore_index, reduction=reduction)


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, mode: str,
               gamma: float = 2.0, alpha: float | None = 0.25,
               ignore_index: int | None = None,
               reduction: str = "mean") -> jnp.ndarray:
    """Mode-dispatching entry point mirroring the reference FocalLoss class.

    binary/multilabel: `targets` same shape as `logits` (0/1 values).
    multiclass: `logits` (..., C), `targets` (...) int class ids.
    """
    if mode == BINARY_MODE:
        return binary_focal_loss_with_logits(
            logits, targets, gamma, alpha, ignore_index, reduction)
    if mode == MULTICLASS_MODE:
        return multiclass_focal_loss(
            logits, targets, gamma, alpha, ignore_index, reduction)
    if mode == MULTILABEL_MODE:
        return multilabel_focal_loss(
            logits, targets, gamma, alpha, ignore_index, reduction)
    raise ValueError(f"unknown mode {mode!r}")
