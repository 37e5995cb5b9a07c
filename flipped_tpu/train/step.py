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
import numpy as np
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
                    qav: bool, lr_fn=None, lm_chunk: int = 0):
    """Returns train_step(trainable, opt_state, frozen, batch) → (trainable,
    opt_state, TrainMetrics).

    `batch` leaves have a leading accumulation axis: (accum, B, ...).
    lm_chunk > 0 computes the LM-head CE in sequence chunks (no full-vocab
    logit buffer — see objectives.lm_ce_rowwise_chunked).
    """

    def loss_fn(trainable, frozen, microbatch):
        params = {"params": merge_params(trainable, frozen)}
        losses = compute_objective_losses(model, params, microbatch, vaq, qav,
                                          lm_chunk=lm_chunk)
        return losses.total, losses

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(trainable, opt_state, frozen, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        accum = jax.tree_util.tree_leaves(batch)[0].shape[0]

        if accum == 1:
            # no accumulation: skip the scan — the while-loop body would
            # cost a zeros-init + add pass over the grad tree and walls the
            # whole fwd+bwd into a loop body whose buffers XLA assigns
            # conservatively (long-context configs are HBM-marginal)
            microbatch = jax.tree_util.tree_map(lambda x: x[0], batch)
            (_, losses), grads = grad_fn(trainable, frozen, microbatch)
            losses = jax.tree_util.tree_map(lambda x: x[None], losses)
        else:
            def micro_step(grad_acc, microbatch):
                (_, losses), grads = grad_fn(trainable, frozen, microbatch)
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
                return grad_acc, losses

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), trainable)
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


def _host_view(x) -> np.ndarray:
    """Local host view of an array: plain np.asarray, or for a multi-process
    sharded jax.Array, this process's rows (unique addressable shards in
    index order — row alignment across same-sharded arrays is preserved)."""
    if getattr(x, "is_fully_addressable", True) or x.is_fully_replicated:
        return np.asarray(x)
    seen, parts = set(), []
    for s in x.addressable_shards:
        start = s.index[0].start or 0
        if start in seen:
            continue
        seen.add(start)
        parts.append((start, np.asarray(s.data)))
    parts.sort(key=lambda t: t[0])
    return np.concatenate([d for _, d in parts], axis=0)


def required_eval_span(batch) -> tuple:
    """Host-side exactness bound for the cached option scorer.

    Returns (span_len, exact): the smallest L such that every nonzero label
    lies in [prefix, prefix+L], and whether such an L exists (False when a
    nonzero label precedes `prefix`, in which case only the dense scorer is
    exact). Cheap: reads labels/prefix, which originate on the host loader.
    Multi-process: reduced across processes so every process compiles the
    same program (a per-process L would desynchronize the SPMD programs).

    NOTE: the training CLI no longer calls this per batch — the loader stamps
    `span_need`/`span_exact` at pack time (data/batching.py:pack_eval_batch)
    and multi-process runs pin a dataset-level span once at setup
    (data/pipeline.py:dataset_eval_span), so eval runs with zero per-batch
    collectives. This remains for callers holding ad-hoc batches.
    """
    from ..data.batching import eval_span

    lab = _host_view(batch["vqa_labels"])         # (B, n_opt, S)
    pre = _host_view(batch["prefix"]).astype(np.int64)  # (B,)
    need, exact = eval_span(lab, pre)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        agg = multihost_utils.process_allgather(
            np.asarray([need, 0 if exact else 1], np.int64))
        need = int(np.max(agg[..., 0]))
        exact = not bool(np.any(agg[..., 1]))
    return max(need, 1), exact


def bucket_span(n: int, s: int) -> int:
    """Round up to a multiple of 8 to bound the number of compiled shapes."""
    return min(max(8, -(-n // 8) * 8), max(s - 1, 1))


_bucket_span = bucket_span  # backwards-compatible alias


def make_eval_step(model, cached: bool = True, span_len: int | None = None):
    """Classification eval: per-option scores → predictions
    (reference: engine.py:87-93).

    cached=True scores options against a shared prompt-prefix KV cache
    (~n_opt× fewer FLOPs — reference runs every option's full sequence,
    model_my_original_mod.py:249-377). span_len=None auto-sizes the scored
    answer window per batch from the labels (bucketed to multiples of 8 to
    bound recompiles) so the cached path is ALWAYS exact; if a batch has
    labeled tokens before `prefix` (impossible under this repo's masking,
    defensive only) it falls back to the dense scorer. An explicit span_len
    pins the compile shape WITHOUT per-batch checks — for hot loops whose
    caller has already verified fit via `required_eval_span` (device-array
    batches would otherwise pay a host fetch per step).
    cached=False always runs the reference-style dense per-option forward."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def cached_step(trainable, frozen, batch, L) -> Dict[str, jax.Array]:
        params = {"params": merge_params(trainable, frozen)}
        scores = option_scores_cached(model, params, batch, L)
        return {"scores": scores, "prediction": jnp.argmin(scores, axis=-1)}

    @jax.jit
    def dense_step(trainable, frozen, batch) -> Dict[str, jax.Array]:
        params = {"params": merge_params(trainable, frozen)}
        scores = option_scores(model, params, batch)   # (B, n_opt)
        return {"scores": scores, "prediction": jnp.argmin(scores, axis=-1)}

    if not cached:
        def eval_step(trainable, frozen, batch,
                      span_info: tuple | None = None) -> Dict[str, jax.Array]:
            return dense_step(trainable, frozen, batch)

        eval_step.span_pinned = False
        # the dense scorer consumes no span: callers (cli/train.py val loop)
        # must not pay the host fetch / multi-process allgather to compute
        # one (e.g. --pp runs, where eval is always dense)
        eval_step.span_free = True
        return eval_step

    def eval_step(trainable, frozen, batch,
                  span_info: tuple | None = None) -> Dict[str, jax.Array]:
        if span_len is not None:
            return cached_step(trainable, frozen, batch, span_len)
        # span_info: a precomputed span (the loader's pack-time
        # span_need/span_exact scalars, or a required_eval_span(...) result).
        # Callers holding the HOST batch (e.g. val_one_epoch, before
        # sharding) should pass it so device batches aren't fetched back.
        need, exact = (span_info if span_info is not None
                       else required_eval_span(batch))
        if not exact:
            return dense_step(trainable, frozen, batch)
        s = batch["vqa_labels"].shape[-1]
        return cached_step(trainable, frozen, batch, bucket_span(need, s))

    eval_step.span_pinned = span_len is not None
    eval_step.span_free = False
    return eval_step
