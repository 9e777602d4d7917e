"""Jit-compiled SPMD training step.

One `train_step` handles the whole update (forward, loss, backward, clip,
AdamW, BN stat update) under `jax.jit` with the batch sharded over the `data`
mesh axis and parameters replicated — the TPU-native equivalent of the
reference's Lightning DDP loop (/root/reference/exps/sgv3d/...r50...py:307-338,
400-405). Gradient averaging across devices falls out of XLA's psum on the
sharded-batch loss; no explicit collective code.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from sgv3d_tpu.config import ExpConfig
from sgv3d_tpu.models.bev_height import BEVHeight, train_loss
from sgv3d_tpu.train.sharding import batch_sharding, replicated


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model: BEVHeight, cfg: ExpConfig,
                       tx: optax.GradientTransformation, sample_batch,
                       seed: int = 0) -> TrainState:
    imgs, mats = sample_batch
    # jit the init: un-jitted flax init executes op-by-op, which through the
    # axon TPU relay costs a round trip PER OP (~7 minutes for the r101
    # stack — measured r5, the round-4/5 bench.py timeout root cause); one
    # compiled call runs in seconds.
    variables = jax.jit(model.init, static_argnums=3)(
        {"params": jax.random.PRNGKey(seed),
         "dropout": jax.random.PRNGKey(seed + 1)},
        jnp.asarray(imgs), {k: jnp.asarray(v) for k, v in mats.items()}, True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats,
                      jax.jit(tx.init)(params))


def make_train_step(model: BEVHeight, cfg: ExpConfig,
                    tx: optax.GradientTransformation,
                    mesh: Mesh | None = None,
                    donate: bool = True) -> Callable:
    """Returns train_step(state, imgs, mats, gt_boxes, gt_labels, gt_semantic)
    -> (state, metrics). When `mesh` is given, batch args are annotated as
    sharded over the data axis and state as replicated."""

    def step_fn(state: TrainState, imgs, mats, gt_boxes, gt_labels,
                gt_semantic, gt_embeds=None):
        def loss_fn(params):
            (preds, aux), new_vars = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, mats, True,
                rngs={"dropout": jax.random.fold_in(
                    jax.random.PRNGKey(0), state.step)},
                mutable=["batch_stats"])
            loss, metrics = train_loss(cfg, preds, aux, gt_boxes, gt_labels,
                                       gt_semantic, gt_embeds)
            return loss, (metrics, new_vars["batch_stats"])

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(state.step + 1, new_params, new_bs, new_opt)
        return new_state, metrics

    # Sharding annotations are only meaningful on multi-device meshes; on a
    # single device they force a pathological host-mediated resharding path
    # through the TPU relay (~95 s/step vs 0.3 s with plain jit).
    if mesh is None or mesh.size == 1:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, bs, bs, bs, bs, bs),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model: BEVHeight, cfg: ExpConfig,
                   mesh: Mesh | None = None) -> Callable:
    """Returns eval_step(params, batch_stats, imgs, mats) -> Detections."""
    from sgv3d_tpu.decode import decode

    def step_fn(params, batch_stats, imgs, mats):
        preds, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, mats, False)
        return decode(cfg.head, preds)

    if mesh is None or mesh.size == 1:
        return jax.jit(step_fn)
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(step_fn, in_shardings=(rep, rep, bs, bs),
                   out_shardings=bs)
