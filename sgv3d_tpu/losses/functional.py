"""Functional loss library completing the reference's losses/_functional.py:
soft dice/jaccard/tversky scores, wing loss, label-smoothed NLL, softmax
focal. (The binary/multiclass focal entry points live in losses/focal.py.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_dice_score(output, target, smooth=0.0, eps=1e-7, dims=None):
    if dims is not None:
        intersection = jnp.sum(output * target, axis=dims)
        cardinality = jnp.sum(output + target, axis=dims)
    else:
        intersection = jnp.sum(output * target)
        cardinality = jnp.sum(output + target)
    return (2.0 * intersection + smooth) / jnp.clip(
        cardinality + smooth, eps, None)


def soft_jaccard_score(output, target, smooth=0.0, eps=1e-7, dims=None):
    if dims is not None:
        intersection = jnp.sum(output * target, axis=dims)
        cardinality = jnp.sum(output + target, axis=dims)
    else:
        intersection = jnp.sum(output * target)
        cardinality = jnp.sum(output + target)
    union = cardinality - intersection
    return (intersection + smooth) / jnp.clip(union + smooth, eps, None)


def soft_tversky_score(output, target, alpha, beta, smooth=0.0, eps=1e-7,
                       dims=None):
    if dims is not None:
        intersection = jnp.sum(output * target, axis=dims)
        fp = jnp.sum(output * (1.0 - target), axis=dims)
        fn = jnp.sum((1.0 - output) * target, axis=dims)
    else:
        intersection = jnp.sum(output * target)
        fp = jnp.sum(output * (1.0 - target))
        fn = jnp.sum((1.0 - output) * target)
    return (intersection + smooth) / jnp.clip(
        intersection + alpha * fp + beta * fn + smooth, eps, None)


def wing_loss(output, target, width=5.0, curvature=0.5):
    diff_abs = jnp.abs(target - output)
    c = width - width * jnp.log(1.0 + width / curvature)
    loss = jnp.where(diff_abs < width,
                     width * jnp.log(1.0 + diff_abs / curvature),
                     diff_abs - c)
    return jnp.mean(loss)


def label_smoothed_nll_loss(lprobs, target, epsilon, ignore_index=None):
    """lprobs: (..., C) log-probabilities; target: (...) int labels."""
    nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(lprobs, axis=-1)
    if ignore_index is not None:
        mask = (target != ignore_index).astype(lprobs.dtype)
        nll = nll * mask
        smooth = smooth * mask
        denom = jnp.maximum(jnp.sum(mask), 1.0)
    else:
        denom = nll.size
    eps_i = epsilon / lprobs.shape[-1]
    return jnp.sum((1.0 - epsilon) * nll + eps_i * smooth * lprobs.shape[-1]
                   ) / denom


def softmax_focal_loss_with_logits(logits, target, gamma=2.0,
                                   reduction="mean"):
    """Multiclass focal on softmax log-probs (reference :99-130 semantics)."""
    log_softmax = jax.nn.log_softmax(logits, axis=-1)
    logpt = -jnp.take_along_axis(log_softmax, target[..., None], axis=-1)[..., 0]
    pt = jnp.exp(-logpt)
    loss = jnp.power(1.0 - pt, gamma) * logpt
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss
