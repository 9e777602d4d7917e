"""Optimizer: AdamW + MultiStep LR + global-norm clipping.

Schedule parity: /root/reference/exps/sgv3d/...r50...py:400-405 — AdamW with
lr = 2e-4/64 * batch_per_device * num_devices, weight decay 1e-7,
MultiStepLR gamma 0.1 at epoch milestones, grad clip 5 (Trainer default
:529). LR scaling uses the global batch, so DP changes only throughput.
"""
from __future__ import annotations

import optax

from sgv3d_tpu.config import ExpConfig


def multistep_schedule(base_lr: float, milestones_steps: list[int],
                       gamma: float = 0.1) -> optax.Schedule:
    boundaries = {int(s): gamma for s in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def schedule_value(cfg: ExpConfig, num_devices: int, steps_per_epoch: int,
                   step: int, gamma: float = 0.1) -> float:
    """Host-side (pure python) value of the multistep schedule at `step`.

    Matches `make_optimizer`'s optax schedule exactly (parity-tested in
    tests/test_train_optim.py). The training loop logs the LR every step;
    calling the optax schedule eagerly there runs several jnp ops per step
    — a device round trip EACH on the axon TPU relay (CLAUDE.md landmine 6;
    code review r5)."""
    lr = cfg.basic_lr_per_img * cfg.batch_size_per_device * num_devices
    for m in cfg.lr_milestones:
        # optax.piecewise_constant_schedule applies a boundary's scale for
        # count >= boundary (verified empirically; parity test)
        if step >= m * steps_per_epoch:
            lr *= gamma
    return lr


def make_optimizer(cfg: ExpConfig, num_devices: int, steps_per_epoch: int
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    lr = cfg.basic_lr_per_img * cfg.batch_size_per_device * num_devices
    schedule = multistep_schedule(
        lr, [m * steps_per_epoch for m in cfg.lr_milestones])
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=cfg.weight_decay),
    )
    return tx, schedule
