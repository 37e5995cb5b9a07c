"""Adapter-gated two-segment attention — exact einsum formulation.

Re-implements the reference's Attention.forward math (reference:
llama/model.py:87-128) in a decomposed form that is both exact and
flash-friendly:

    out = softmax(q·k_adapterᵀ) · tanh(gate1) @ v_adapter        (segment A)
        + softmax(q·k_textᵀ + causal + gate2·video_block) @ v_text  (segment B)

The reference concatenates both probability segments and does one PV matmul
(model.py:123-126); since the two segments are softmax-normalized
*independently* (model.py:115, 120), the sum of two attention outputs is
mathematically identical. Segment A is a tiny exact attention over
adapter_len (=10) keys; segment B is a standard causal attention with an
additive per-head bias `gate2` on the rectangular block
(rows ≥ video_start+max_feats) × (video_start ≤ cols < video_start+max_feats)
(model.py:116-119) — which is exactly the form a flash kernel can stream.

`video_start` is per-sequence with sentinel -1 meaning "no video block bias"
(the reference passes video_start=None for the QAV objective, model.py:345).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def video_block_bias(video_start: jax.Array, seq_len: int, max_feats: int,
                     gate2: jax.Array) -> jax.Array:
    """Additive bias (B, H, S, S): gate2 on the text-rows × video-cols block.

    video_start: (B,) int32, -1 → zero bias (reference: model.py:116-121).
    gate2: (H,) learnable per-head scalar, init -bias (model.py:85).
    """
    rows = jnp.arange(seq_len)[:, None]      # (S, 1) query positions
    cols = jnp.arange(seq_len)[None, :]      # (1, S) key positions
    vs = video_start[:, None, None]          # (B, 1, 1)
    block = ((rows >= vs + max_feats)
             & (cols >= vs) & (cols < vs + max_feats)
             & (vs >= 0))                    # (B, S, S) bool
    return block[:, None, :, :] * gate2[None, :, None, None]


def adapter_prefix_attention(q: jax.Array, adapter_k: jax.Array,
                             adapter_v: jax.Array,
                             gate1: jax.Array) -> jax.Array:
    """Segment A — exact tiny attention over the adapter prefix (L≈10 keys),
    softmaxed independently and scaled by tanh(gate1) (reference:
    model.py:115). The ONE implementation shared by the einsum, chunk-extend,
    decode, and Pallas-recombination paths.

    q: (B, Q, H, Dh) rope'd queries; adapter_k/v: (L, H, Dh) un-rope'd.
    Returns (B, Q, H, Dh) in q.dtype.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)
    scores = jnp.einsum("bqhd,lhd->bhql", q, adapter_k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * scale
    probs = (jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
             * jnp.tanh(gate1.astype(jnp.float32))[None, :, None, None])
    return jnp.einsum("bhql,lhd->bqhd", probs.astype(q.dtype),
                      adapter_v.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def adapter_gated_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            adapter_k: jax.Array, adapter_v: jax.Array,
                            gate1: jax.Array, gate2: jax.Array,
                            video_start: jax.Array, max_feats: int) -> jax.Array:
    """Exact two-segment attention.

    q, k, v:       (B, S, H, Dh) — rope already applied to q, k
                   (adapter keys get NO rope, reference: model.py:96-101).
    adapter_k/v:   (L, H, Dh) — shared across batch (model.py:99-100).
    gate1, gate2:  (H,) learnable; gate1 zero-init, gate2 init -bias.
    video_start:   (B,) int32, -1 sentinel → no gate2 block.
    Returns:       (B, S, H*Dh)
    """
    b, s, h, dh = q.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)

    qh = jnp.einsum("bshd->bhsd", q)
    kh = jnp.einsum("bshd->bhsd", k)
    vh = jnp.einsum("bshd->bhsd", v)

    # --- segment B: causal text attention with the video-block bias ---------
    scores = jnp.einsum("bhsd,bhtd->bhst", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    scores = scores + video_block_bias(video_start, s, max_feats,
                                       gate2.astype(jnp.float32))
    text_probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", text_probs.astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)

    # --- segment A: adapter prefix, separate softmax × tanh(gate1) ----------
    out = out + jnp.einsum(
        "bshd->bhsd", adapter_prefix_attention(q, adapter_k, adapter_v, gate1))

    return jnp.einsum("bhsd->bshd", out.astype(q.dtype)).reshape(b, s, h * dh)


def chunk_extend_attention(q: jax.Array, k_chunk: jax.Array,
                           v_chunk: jax.Array, cache_k: jax.Array,
                           cache_v: jax.Array, adapter_k: jax.Array,
                           adapter_v: jax.Array, gate1: jax.Array,
                           gate2: jax.Array, video_start: jax.Array,
                           prefix: jax.Array, n_opt: int,
                           max_feats: int) -> jax.Array:
    """Prefix-shared option scoring: n_opt short chunks per example attend a
    SHARED prompt cache plus themselves (option-local causal) — the
    TPU-native replacement for re-running the full sequence once per answer
    option (reference: model_my_original_mod.py:249-377 runs (B·n_opt, S)).

    q/k_chunk/v_chunk: (B, n_opt*L, H, Dh) — rope'd at positions prefix+j.
    cache_k/v:         (B, Smax, H, Dh) — prompt cache; only columns
                       < prefix[b] are visible (identical across options).
    prefix:            (B,) int32 — the shared-prompt length per example.
    Returns (B, n_opt*L, H*Dh).
    """
    b, nl, h, dh = q.shape
    chunk_len = nl // n_opt
    s_max = cache_k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)

    # --- cache segment: visible strictly below prefix --------------------
    cache_scores = jnp.einsum("bqhd,bthd->bhqt", q, cache_k,
                              preferred_element_type=jnp.float32) * scale
    cols = jnp.arange(s_max)[None, None, None, :]
    pfx = prefix[:, None, None, None]
    vs = video_start[:, None, None, None]
    block = ((cols >= vs) & (cols < vs + max_feats) & (vs >= 0))
    # every chunk row sits at position ≥ prefix > vs+max_feats → gate2 rows
    cache_scores = cache_scores + block * gate2.astype(jnp.float32)[None, :, None, None]
    cache_scores = jnp.where(cols < pfx, cache_scores, NEG_INF)

    # --- intra-chunk segment: option-local causal -------------------------
    intra_scores = jnp.einsum("bqhd,bkhd->bhqk", q, k_chunk,
                              preferred_element_type=jnp.float32) * scale
    qi = jnp.arange(nl)
    same_opt = (qi[:, None] // chunk_len) == (qi[None, :] // chunk_len)
    causal = qi[None, :] <= qi[:, None]
    intra_mask = same_opt & causal
    intra_scores = jnp.where(intra_mask[None, None], intra_scores, NEG_INF)

    # one softmax over [cache ; intra] keys (one attention row)
    scores = jnp.concatenate([cache_scores, intra_scores], axis=-1)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = (jnp.einsum("bhqt,bthd->bqhd", probs[..., :s_max], cache_v,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqk,bkhd->bqhd", probs[..., s_max:], v_chunk,
                        preferred_element_type=jnp.float32))

    # adapter prefix segment (independent softmax × tanh(gate1))
    out = out + adapter_prefix_attention(q, adapter_k, adapter_v, gate1)
    return out.astype(q.dtype).reshape(b, nl, h * dh)


def decode_attention(q: jax.Array, cache_k: jax.Array, cache_v: jax.Array,
                     adapter_k: jax.Array, adapter_v: jax.Array,
                     gate1: jax.Array, gate2: jax.Array,
                     video_start: jax.Array, pos: jax.Array,
                     max_feats: int) -> jax.Array:
    """Single-token two-segment attention over a KV cache (the TPU-native
    generation path; the reference re-runs the full O(S²) forward per token,
    model.py:429-442).

    q:             (B, 1, H, Dh) — rope already applied at `pos`
    cache_k/v:     (B, Smax, H, Dh) — positions ≤ pos are live
    video_start:   (B,) int32 (-1 → no gate2 block)
    pos:           (B,) int32 — the query's absolute position
    Returns (B, 1, H*Dh).
    """
    b, _, h, dh = q.shape
    s_max = cache_k.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32)).astype(q.dtype)

    scores = jnp.einsum("bohd,bthd->bhot", q, cache_k,
                        preferred_element_type=jnp.float32) * scale
    cols = jnp.arange(s_max)[None, None, None, :]        # (1,1,1,Smax)
    p = pos[:, None, None, None]
    vs = video_start[:, None, None, None]
    # gate2 video block: this query row is ≥ vs+max_feats whenever decoding
    # past the prompt; guard anyway (reference: model.py:116-119)
    block = ((p >= vs + max_feats) & (cols >= vs)
             & (cols < vs + max_feats) & (vs >= 0))
    scores = scores + block * gate2.astype(jnp.float32)[None, :, None, None]
    scores = jnp.where(cols <= p, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhot,bthd->bohd", probs.astype(q.dtype), cache_v,
                     preferred_element_type=jnp.float32)

    out = out + adapter_prefix_attention(q, adapter_k, adapter_v, gate1)
    return out.astype(q.dtype).reshape(b, 1, h * dh)
