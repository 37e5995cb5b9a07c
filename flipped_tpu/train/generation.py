"""Generation-style evaluation: KV-cached greedy decode + embedding matching.

Reproduces the fork's generation inference semantics (reference:
llama/model.py:367-546, engine.py:78-121) with a real KV cache: the reference
re-runs the full O(S²) forward over the whole sequence for each of the 31
generated positions *per batch item* (model.py:429-442); here one batched
prefill + 31 batched single-token decode steps produce identical greedy
tokens (causality makes the suffix re-forwards equivalent).

Matching pipeline (reference: model.py:476-512, 552-623):
  * generated-answer embedding: generated tokens limited to the option-0
    answer-span length (the reference's vqa_placeholder_mask), cut at eos,
    mean-pooled token embeddings (zeros if empty);
  * choice embeddings: each option's answer span (prefix → eos) mean-pooled;
  * cosine similarity → argmax option.
MUSIC-AVQA's string-prefix match happens host-side in the trainer with the
decoded strings (reference: engine.py:100-116).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .optim import merge_params

MAX_NEW_TOKENS = 31  # positions prefix…prefix+30 (reference: model.py:439)


def _masked_mean(emb: jax.Array, keep: jax.Array) -> jax.Array:
    """Mean over kept positions; zero vector when none kept
    (reference: model.py:593)."""
    keep = keep.astype(emb.dtype)[..., None]
    total = (emb * keep).sum(axis=-2)
    count = jnp.maximum(keep.sum(axis=-2), 1.0)
    return total / count


def pool_option_embeddings(model, params, all_tokens, prefix, eos_id):
    """Per-option answer-span embeddings, exactly as the reference pools
    them (extract_answers + embed_and_aggregate_answers, model.py:552-576):
    the span runs from `prefix` to the option's eos (exclusive; to the end
    when eos is absent), every item's options are padded to its LONGEST
    span with token id 0, and the mean divides by that padded length — so
    shorter options mix in (L_max − L_i) id-0 embeddings. → (B, n_opt, D)
    f32. Oracle-tested against the reference's own methods in
    tests/test_reference_parity.py."""
    s = all_tokens.shape[-1]
    cols = jnp.arange(s)[None, None]
    opt_span = cols >= prefix[:, None, None]
    opt_eos = jnp.cumsum((all_tokens == eos_id) & opt_span, axis=2) > 0
    opt_keep = opt_span & ~opt_eos
    emb_all = jax.lax.stop_gradient(model.apply(
        params, all_tokens,
        method=lambda m, t: m.tok_embeddings(t))).astype(jnp.float32)
    keep_f = opt_keep.astype(jnp.float32)
    sums = jnp.einsum("bns,bnsd->bnd", keep_f, emb_all)
    lens = keep_f.sum(-1)                                # (B, n)
    lmax = lens.max(axis=1, keepdims=True)               # (B, 1)
    emb0 = jax.lax.stop_gradient(model.apply(
        params, jnp.zeros((1,), jnp.int32),
        method=lambda m, t: m.tok_embeddings(t)))[0].astype(jnp.float32)
    return ((sums + (lmax - lens)[..., None] * emb0[None, None])
            / jnp.maximum(lmax, 1.0)[..., None])         # (B, n, D)


def make_generation_step(model, eos_id: int,
                         max_new_tokens: int = MAX_NEW_TOKENS):
    """Returns gen_step(trainable, frozen, batch) → dict with
    generated (B, max_new_tokens), similarity (B, n_opt), prediction (B,).

    batch: eval-style (option-expanded) + 'prefix' (B,) int32 = answer-span
    start of the option-0 sequence (a_token + 5)."""

    def embed(params, tokens):
        return jax.lax.stop_gradient(model.apply(
            params, tokens, method=lambda m, t: m.tok_embeddings(t)))

    @jax.jit
    def gen_step(trainable, frozen, batch) -> Dict[str, jax.Array]:
        params = {"params": merge_params(trainable, frozen)}
        all_tokens = batch["vqa_tokens"]            # (B, n_opt, S)
        prefix = batch["prefix"].astype(jnp.int32)  # (B,)
        tokens = all_tokens[:, 0]                   # option-0 (model.py:385)
        b, s = tokens.shape
        cache_len = s + max_new_tokens + 1

        vf = model.apply(params, batch.get("video"), batch.get("audio"),
                         method="fuse")
        h, ck, cv = model.apply(params, tokens, vf,
                                batch["vqa_video_start"],
                                batch["vqa_splice"], cache_len,
                                method="prefill")
        # first prediction: logits at position prefix-1 → token at prefix
        h_last = jnp.take_along_axis(
            h, (prefix - 1)[:, None, None], axis=1)     # (B,1,D)
        logits0 = model.apply(params, h_last, method="lm_logits")[:, 0]
        tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)

        def step(carry, i):
            tok, ck, cv = carry
            pos = prefix + i
            logits, ck, cv = model.apply(params, tok, ck, cv, pos,
                                         batch["vqa_video_start"],
                                         method="decode_step")
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, ck, cv), tok

        (last, _, _), toks = jax.lax.scan(
            step, (tok0, ck, cv), jnp.arange(max_new_tokens - 1))
        generated = jnp.concatenate(
            [jnp.swapaxes(toks, 0, 1), last[:, None]], axis=1)  # (B, T)

        # --- generated-answer embedding (reference: model.py:476-505) -------
        span_len = (batch["vqa_labels"][:, 0, 1:] != 0).sum(-1)   # (B,)
        idx = jnp.arange(max_new_tokens)[None]
        in_span = idx < span_len[:, None]
        after_eos = jnp.cumsum(generated == eos_id, axis=1) > 0
        keep = in_span & ~after_eos
        gen_emb = _masked_mean(embed(params, generated).astype(jnp.float32),
                               keep)                               # (B, D)

        # --- per-option answer-span embeddings (model.py:552-576) -----------
        opt_emb = pool_option_embeddings(model, params, all_tokens, prefix,
                                         eos_id)             # (B, n, D)

        # --- cosine similarity → prediction (model.py:596-623) --------------
        gen_n = gen_emb / jnp.maximum(
            jnp.linalg.norm(gen_emb, axis=-1, keepdims=True), 1e-12)
        opt_n = opt_emb / jnp.maximum(
            jnp.linalg.norm(opt_emb, axis=-1, keepdims=True), 1e-12)
        similarity = jnp.einsum("bnd,bd->bn", opt_n, gen_n)
        return {"generated": generated, "similarity": similarity,
                "prediction": jnp.argmax(similarity, axis=-1)}

    return gen_step


def decode_generated(tokenizer, generated_row, eos_id: int) -> str:
    """Host-side: decode one generated row, cut at eos/pad (reference:
    model.py:527-538) — used for saved answers + MUSIC-AVQA prefix match."""
    toks = []
    for t in [int(x) for x in generated_row]:
        if t == eos_id or t == 0:
            break
        toks.append(t)
    return tokenizer.decode(toks)
