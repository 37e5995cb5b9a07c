"""The three flipped objectives as one fused forward.

The reference runs three sequential layer sweeps per step — VQA, VAQ, QAV
share weights but traverse the network one after another (reference:
llama/model.py:338-345). Here the enabled objectives are stacked on the batch
axis into a single `encode()` call, so XLA sees one matmul stream per layer
(3× larger, better MXU utilization) and per-sequence `video_start` sentinels
replace the Python-level gate2 branch. The LM head runs only on the VQA/VAQ
rows — QAV needs h·video_featureᵀ, not vocab logits (reference:
model.py:358-361).

Loss semantics preserved exactly:
  * VQA/VAQ: cross-entropy on shifted labels with ignore_index=0 — the pad id
    0 doubles as the mask (reference: model.py:233-234, 347-356).
  * QAV: CE over max_feats frame indices of (h·vfᵀ)/tau with ignore_index=-1
    (reference: model.py:235, 358-361), where vf is the *pre-temporal*
    projected video feature.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class Losses(NamedTuple):
    vqa: jax.Array
    vaq: jax.Array
    qav: jax.Array

    @property
    def total(self):
        return self.vqa + self.vaq + self.qav


def ce_ignore_index(logits: jax.Array, labels: jax.Array,
                    ignore_index: int) -> jax.Array:
    """Mean cross-entropy over positions where labels != ignore_index,
    matching torch.nn.CrossEntropyLoss(ignore_index=...) reduction."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    losses = jnp.where(valid, -tok_ll, 0.0)
    return losses.sum() / jnp.maximum(valid.sum(), 1)


def token_ce_unreduced(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-token CE with ignore_index=0 → 0.0, unreduced — the reference's
    inference_criterion (model.py:236, model_my_original_mod.py:375-377)."""
    logits = logits.astype(jnp.float32)
    valid = labels != 0
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.where(valid, -tok_ll, 0.0)


def lm_ce_rowwise_chunked(model, params, h: jax.Array, labels: jax.Array,
                          chunk_size: int) -> tuple:
    """Per-row CE sum and valid-token count WITHOUT materializing the
    (rows, S, vocab) logit tensor.

    The dense path in `compute_objective_losses` holds the full vocab-width
    logits (plus f32 log-softmax residuals for backward) — ~1.5 GB at
    S=4096 for the 2 LM rows, the margin by which the 3-objective stack
    overflows a 16 GB chip at long context. Here the sequence axis is swept
    in `chunk_size` slices under `lax.scan`; each slice projects to vocab,
    reduces to a per-row (sum, count) pair, and is wrapped in
    `jax.checkpoint` so backward recomputes the slice's logits instead of
    saving them. Peak live vocab-width memory: ONE chunk. Numerics are
    identical to the dense path (f32 log-softmax, same sum/count reduction;
    only the reduction order over chunks differs).

    h: (rows, S-1, D) — already shifted (positions predicting labels[1:]).
    labels: (rows, S-1) int, ignore_index=0.
    Returns (sum (rows,) f32, count (rows,) int32).
    """
    rows, sm1, d = h.shape
    chunk_size = min(chunk_size, sm1)  # don't pad PAST the sequence
    nc = -(-sm1 // chunk_size)
    pad = nc * chunk_size - sm1
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))  # pad id 0 == ignore
    h_c = h.reshape(rows, nc, chunk_size, d).transpose(1, 0, 2, 3)
    l_c = labels.reshape(rows, nc, chunk_size).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_ce(hc, lc):
        logits = model.apply(params, hc, method="lm_logits")
        logits = logits.astype(jnp.float32)
        valid = lc != 0
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_ll = jnp.take_along_axis(logp, lc[..., None], axis=-1)[..., 0]
        return (jnp.where(valid, -tok_ll, 0.0).sum(-1),
                valid.sum(-1).astype(jnp.int32))

    def body(carry, xs):
        s, c = chunk_ce(*xs)
        return (carry[0] + s, carry[1] + c), None

    init = (jnp.zeros((rows,), jnp.float32), jnp.zeros((rows,), jnp.int32))
    (tot, cnt), _ = jax.lax.scan(body, init, (h_c, l_c))
    return tot, cnt


def fused_forward(model, params, batch: Dict[str, Any], vaq: bool, qav: bool):
    """Run fuse + stacked encode; returns (h per objective, raw video feats).

    batch keys (training shapes, n_options already squeezed to 1):
      video (B,F,Dv)|audio (B,Fa,Da), and per objective k:
      {k}_tokens (B,S) int32, {k}_labels (B,S) int32,
      {k}_video_start (B,) int32 (-1 on qav rows), {k}_splice (B,F) int32.

    Splitting encode from the loss heads lets eval reuse the same path."""
    video = batch.get("video")
    audio = batch.get("audio")
    vf = model.apply(params, video, audio, method="fuse")  # (B,F,D)
    b = batch["vqa_tokens"].shape[0]

    keys = ["vqa"] + (["vaq"] if vaq else []) + (["qav"] if qav else [])
    tokens = jnp.concatenate([batch[f"{k}_tokens"] for k in keys], axis=0)
    vstart = jnp.concatenate([batch[f"{k}_video_start"] for k in keys], axis=0)
    splice = jnp.concatenate([batch[f"{k}_splice"] for k in keys], axis=0)
    vf_rep = jnp.concatenate([vf] * len(keys), axis=0)

    h = model.apply(params, tokens, vf_rep, vstart, splice, method="encode")
    parts = {k: h[i * b:(i + 1) * b] for i, k in enumerate(keys)}
    return parts, vf


def compute_objective_losses(model, params, batch: Dict[str, Any], vaq: bool,
                             qav: bool, lm_chunk: int = 0) -> Losses:
    """lm_chunk > 0 sweeps the LM head in sequence chunks of that size
    (see `lm_ce_rowwise_chunked`) instead of materializing full-vocab
    logits — same losses, bounded vocab-width memory."""
    parts, vf = fused_forward(model, params, batch, vaq, qav)
    zero = jnp.zeros((), jnp.float32)

    # LM head over VQA (+VAQ) rows only.
    lm_keys = ["vqa"] + (["vaq"] if vaq else [])
    lm_h = jnp.concatenate([parts[k] for k in lm_keys], axis=0)
    b = batch["vqa_tokens"].shape[0]

    if lm_chunk > 0:
        lm_labels = jnp.concatenate(
            [batch[f"{k}_labels"] for k in lm_keys], axis=0)
        tot, cnt = lm_ce_rowwise_chunked(
            model, params, lm_h[:, :-1], lm_labels[:, 1:], lm_chunk)

        def lm_loss(k, idx):
            s = tot[idx * b:(idx + 1) * b].sum()
            c = cnt[idx * b:(idx + 1) * b].sum()
            return s / jnp.maximum(c, 1)
    else:
        logits = model.apply(params, lm_h, method="lm_logits")  # (nB,S,V)

        def lm_loss(k, idx):
            lg = logits[idx * b:(idx + 1) * b, :-1]
            labels = batch[f"{k}_labels"][:, 1:]
            return ce_ignore_index(lg, labels, ignore_index=0)

    vqa_loss = lm_loss("vqa", 0)
    vaq_loss = lm_loss("vaq", 1) if vaq else zero
    if qav:
        qav_logits = model.apply(params, parts["qav"], vf,
                                 method="qav_logits")  # (B,S-1,F)
        qav_loss = ce_ignore_index(qav_logits,
                                   batch["qav_labels"][:, 1:],
                                   ignore_index=-1)
    else:
        qav_loss = zero
    return Losses(vqa=vqa_loss, vaq=vaq_loss, qav=qav_loss)


def option_scores(model, params, batch: Dict[str, Any]) -> jax.Array:
    """Classification eval: per-option mean token CE → (B, n_options).

    Reproduces the reference's scoring: unreduced CE per token, count of
    nonzero losses, prediction = argmin(sum/count) (reference:
    model_my_original_mod.py:375-377, engine.py:87-93). Returns the per-option
    score matrix; argmin is taken by the caller.
    """
    video = batch.get("video")
    audio = batch.get("audio")
    tokens = batch["vqa_tokens"]          # (B, n_opt, S)
    labels = batch["vqa_labels"]          # (B, n_opt, S)
    b, n_opt, s = tokens.shape

    vf = model.apply(params, video, audio, method="fuse")       # (B,F,D)
    vf_rep = jnp.repeat(vf, n_opt, axis=0)                       # (B*n,F,D)
    vstart = jnp.repeat(batch["vqa_video_start"], n_opt, axis=0)
    splice = jnp.repeat(batch["vqa_splice"], n_opt, axis=0)

    h = model.apply(params, tokens.reshape(b * n_opt, s), vf_rep, vstart,
                    splice, method="encode")
    logits = model.apply(params, h[:, :-1], method="lm_logits")
    tok_losses = token_ce_unreduced(
        logits, labels.reshape(b * n_opt, s)[:, 1:])             # (B*n,S-1)
    tok_losses = tok_losses.reshape(b, n_opt, s - 1)
    count = jnp.maximum((tok_losses != 0).sum(-1), 1)
    return tok_losses.sum(-1) / count


def option_scores_cached(model, params, batch: Dict[str, Any],
                         span_len: int = 32) -> jax.Array:
    """Prefix-shared option scoring — same scores as `option_scores` at
    ~n_opt× fewer FLOPs for prompt-dominated sequences.

    The reference scores options by running every candidate's FULL sequence
    through the network (model_my_original_mod.py:249-377); but candidates
    are identical up to the answer span (tokenizer.py:71-75), so here the
    shared prompt prefills one KV cache per example and all options' short
    answer spans (≤ span_len tokens) are scored against it in one
    chunk-extend forward. Requires batch['prefix'] (B,) — the answer-span
    start. Exact for answer spans of length ≤ span_len + 1.
    """
    video = batch.get("video")
    audio = batch.get("audio")
    tokens = batch["vqa_tokens"]          # (B, n_opt, S)
    labels = batch["vqa_labels"]          # (B, n_opt, S)
    prefix = batch["prefix"].astype(jnp.int32)
    b, n_opt, s = tokens.shape

    vf = model.apply(params, video, audio, method="fuse")
    h, ck, cv = model.apply(params, tokens[:, 0], vf,
                            batch["vqa_video_start"], batch["vqa_splice"],
                            s, method="prefill")

    # shared last-prompt logits predict each option's FIRST answer token
    h_last = jnp.take_along_axis(h, (prefix - 1)[:, None, None], axis=1)
    first_logits = model.apply(params, h_last, method="lm_logits")[:, 0]

    # per-option answer-span tokens, gathered at prefix..prefix+L-1
    j = jnp.arange(span_len)
    tok_idx = jnp.clip(prefix[:, None, None] + j[None, None], 0, s - 1)
    span_tokens = jnp.take_along_axis(
        tokens, jnp.broadcast_to(tok_idx, (b, n_opt, span_len)), axis=2)
    in_range = (prefix[:, None, None] + j[None, None]) < s
    span_tokens = jnp.where(in_range, span_tokens, 0)

    chunk_logits = model.apply(params, span_tokens, ck, cv, prefix,
                               batch["vqa_video_start"],
                               method="extend_logits")   # (B,n,L,V)

    # targets: label at prefix (first) and prefix+1+j (chunk position j)
    first_tgt = jnp.take_along_axis(
        labels, jnp.broadcast_to(prefix[:, None, None], (b, n_opt, 1)),
        axis=2)[..., 0]                                   # (B,n)
    tgt_idx = jnp.clip(prefix[:, None, None] + 1 + j[None, None], 0, s - 1)
    span_tgts = jnp.take_along_axis(
        labels, jnp.broadcast_to(tgt_idx, (b, n_opt, span_len)), axis=2)
    tgt_in_range = (prefix[:, None, None] + 1 + j[None, None]) < s
    span_tgts = jnp.where(tgt_in_range, span_tgts, 0)

    l_first = token_ce_unreduced(
        jnp.broadcast_to(first_logits[:, None], (b, n_opt,
                                                 first_logits.shape[-1])),
        first_tgt)                                        # (B,n)
    l_chunk = token_ce_unreduced(chunk_logits, span_tgts)  # (B,n,L)

    total = l_first + l_chunk.sum(-1)
    count = (l_first != 0).astype(jnp.int32) + (l_chunk != 0).sum(-1)
    return total / jnp.maximum(count, 1)
