"""Jit train/eval steps with gradient accumulation and GSPMD sharding.

Replaces the reference's engine loop internals (reference: engine.py:10-56):
DDP backward allreduce becomes a GSPMD-inserted all-reduce over the dp mesh
axis; the accum_iter Python loop becomes a lax.scan over microbatches inside
one jit (gradients averaged, one optimizer update per call — matching the
reference's `loss/accum_iter` + step-every-accum_iter semantics,
engine.py:37-41); the fp16 GradScaler is unnecessary in bf16 and only its
grad-norm metric is kept (reference: util/misc.py:253-294).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .objectives import (compute_objective_losses, option_scores,
                         option_scores_cached)
from .optim import merge_params


class TrainMetrics(NamedTuple):
    loss: jax.Array
    vqa_loss: jax.Array
    vaq_loss: jax.Array
    qav_loss: jax.Array
    grad_norm: jax.Array
    lr: jax.Array


def make_train_step(model, tx: optax.GradientTransformation, vaq: bool,
                    qav: bool, lr_fn=None):
    """Returns train_step(trainable, opt_state, frozen, batch) → (trainable,
    opt_state, TrainMetrics).

    `batch` leaves have a leading accumulation axis: (accum, B, ...).
    """

    def loss_fn(trainable, frozen, microbatch):
        params = {"params": merge_params(trainable, frozen)}
        losses = compute_objective_losses(model, params, microbatch, vaq, qav)
        return losses.total, losses

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(trainable, opt_state, frozen, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def micro_step(grad_acc, microbatch):
            (_, losses), grads = grad_fn(trainable, frozen, microbatch)
            grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
            return grad_acc, losses

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
        accum = jax.tree_util.tree_leaves(batch)[0].shape[0]
        grads, losses = jax.lax.scan(micro_step, zeros, batch)
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)

        lr = (lr_fn(_opt_count(opt_state) - 1) if lr_fn is not None
              else jnp.zeros(()))
        metrics = TrainMetrics(
            loss=losses.total.mean(), vqa_loss=losses.vqa.mean(),
            vaq_loss=losses.vaq.mean(), qav_loss=losses.qav.mean(),
            grad_norm=grad_norm, lr=lr)
        return trainable, opt_state, metrics

    return train_step


def _opt_count(opt_state):
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(s, optax.ScaleByAdamState):
            return s.count
    return jnp.zeros((), jnp.int32)


def make_eval_step(model, cached: bool = True, span_len: int = 32):
    """Classification eval: per-option scores → predictions
    (reference: engine.py:87-93).

    cached=True scores options against a shared prompt-prefix KV cache
    (~n_opt× fewer FLOPs, exact for answer spans ≤ span_len+1 tokens —
    hold for every benchmark's "(X)"-style answers); cached=False runs the
    reference-style dense per-option forward."""

    @jax.jit
    def eval_step(trainable, frozen, batch) -> Dict[str, jax.Array]:
        params = {"params": merge_params(trainable, frozen)}
        if cached:
            scores = option_scores_cached(model, params, batch, span_len)
        else:
            scores = option_scores(model, params, batch)   # (B, n_opt)
        return {"scores": scores, "prediction": jnp.argmin(scores, axis=-1)}

    return eval_step
