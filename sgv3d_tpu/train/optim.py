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
