"""Dice losses.

`dice_loss` is the simple inline variant each reference exp defines
(/root/reference/exps/sgv3d/...r50...py:183-193). `dice_loss_modes` is the
full library class (/root/reference/losses/dice.py:12-130): binary /
multiclass / multilabel, from_logits, log_loss, smooth/eps, ignore_index and
class selection — reformulated jit-safe (masks instead of boolean indexing).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from sgv3d_tpu.losses.constants import (BINARY_MODE, MULTICLASS_MODE,
                                        MULTILABEL_MODE)
from sgv3d_tpu.losses.functional import soft_dice_score


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1e-5) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    intersection = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target)
    return 1.0 - (2.0 * intersection + smooth) / (union + smooth)


def dice_loss_modes(y_pred: jnp.ndarray, y_true: jnp.ndarray, mode: str,
                    classes: Sequence[int] | None = None,
                    log_loss: bool = False, from_logits: bool = True,
                    smooth: float = 0.0, ignore_index: int | None = None,
                    eps: float = 1e-7) -> jnp.ndarray:
    """Full DiceLoss (channel-last layout).

    binary:     y_pred (B, ..., 1) or (B, ...), y_true same shape.
    multiclass: y_pred (B, ..., C) logits, y_true (B, ...) int ids.
    multilabel: y_pred (B, ..., C), y_true (B, ..., C) 0/1.
    Returns the mean over (per-class) dice terms, zeroing empty classes
    exactly like the reference (dice.py:112-118).
    """
    assert mode in (BINARY_MODE, MULTICLASS_MODE, MULTILABEL_MODE)
    bs = y_true.shape[0]
    if from_logits:
        if mode == MULTICLASS_MODE:
            y_pred = jnp.exp(jax.nn.log_softmax(y_pred, axis=-1))
        else:
            y_pred = jnp.exp(jax.nn.log_sigmoid(y_pred))
    dims = (0, 2)  # reduce over (batch, spatial); keep class axis

    if mode == BINARY_MODE:
        y_true = y_true.reshape(bs, 1, -1).astype(jnp.float32)
        y_pred = y_pred.reshape(bs, 1, -1)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(jnp.float32)
            y_pred = y_pred * mask
            y_true = y_true * mask
    elif mode == MULTICLASS_MODE:
        num_classes = y_pred.shape[-1]
        y_true_flat = y_true.reshape(bs, -1)
        y_pred = y_pred.reshape(bs, -1, num_classes).transpose(0, 2, 1)
        if ignore_index is not None:
            mask = (y_true_flat != ignore_index).astype(jnp.float32)
            y_pred = y_pred * mask[:, None, :]
            oh = jax.nn.one_hot(
                (y_true_flat * mask).astype(jnp.int32), num_classes)
            y_true = oh.transpose(0, 2, 1) * mask[:, None, :]
        else:
            y_true = jax.nn.one_hot(y_true_flat.astype(jnp.int32),
                                    num_classes).transpose(0, 2, 1)
    else:  # multilabel
        num_classes = y_pred.shape[-1]
        y_true = y_true.reshape(bs, -1, num_classes).transpose(
            0, 2, 1).astype(jnp.float32)
        y_pred = y_pred.reshape(bs, -1, num_classes).transpose(0, 2, 1)
        if ignore_index is not None:
            mask = (y_true != ignore_index).astype(jnp.float32)
            y_pred = y_pred * mask
            y_true = y_true * mask

    scores = soft_dice_score(y_pred, y_true.astype(y_pred.dtype),
                             smooth=smooth, eps=eps, dims=dims)
    loss = (-jnp.log(jnp.clip(scores, eps, None)) if log_loss
            else 1.0 - scores)
    # zero the contribution of classes absent from the target
    loss = loss * (jnp.sum(y_true, axis=dims) > 0).astype(loss.dtype)
    if classes is not None:
        loss = loss[jnp.asarray(list(classes))]
    return jnp.mean(loss)
