"""Numerical parity of the JAX model against an independent torch
re-derivation of the reference math (reference: llama/model.py:31-128,
172-365), on tiny configs in float32.

The torch code below is written from the math in SURVEY.md §2, not copied:
RMSNorm with f32 stats, complex-multiply RoPE, two-segment softmax with
tanh(gate1) adapter scaling and the gate2 video-block bias, pre-norm blocks,
frozen-embedding splice, and the three loss heads.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from flipped_tpu.core.config import ModelConfig
from flipped_tpu.model import (FlippedVQAModel, adapter_gated_attention,
                               apply_rope, precompute_rope, rms_norm)

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=97,
                  multiple_of=16, max_seq_len=24, adapter_len=4,
                  adapter_layer=2, max_feats=3, visual_dim=16, bias=3.0,
                  tau=100.0, norm_eps=1e-5)
B, S, F = 2, 24, 3
RTOL, ATOL = 2e-5, 2e-5


# --- independent torch reference math ----------------------------------------

def t_rmsnorm(x, w, eps):
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w


def t_freqs_cis(dim, end, theta=10000.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
    t = torch.arange(end).float()
    return torch.polar(torch.ones((end, dim // 2)), torch.outer(t, freqs))


def t_rope(x, freqs_cis):
    # x: (B, S, H, Dh) → complex pairs
    xc = torch.view_as_complex(x.reshape(*x.shape[:-1], -1, 2))
    out = torch.view_as_real(xc * freqs_cis[None, :, None, :]).flatten(3)
    return out.type_as(x)


def t_attention(x, W, li, freqs_cis, mask, adapter, video_start, max_feats):
    b, s, _ = x.shape
    h, dh = CFG.n_heads, CFG.head_dim
    q = (x @ W[f"l{li}.wq"].T).view(b, s, h, dh)
    k = (x @ W[f"l{li}.wk"].T).view(b, s, h, dh)
    v = (x @ W[f"l{li}.wv"].T).view(b, s, h, dh)
    q, k = t_rope(q, freqs_cis), t_rope(k, freqs_cis)

    al = adapter.shape[0]
    ak = (adapter @ W[f"l{li}.wk"].T).view(1, al, h, dh).repeat(b, 1, 1, 1)
    av = (adapter @ W[f"l{li}.wv"].T).view(1, al, h, dh).repeat(b, 1, 1, 1)
    k = torch.cat([ak, k], dim=1)
    v = torch.cat([av, v], dim=1)
    mask = torch.cat([torch.zeros(1, 1, s, al), mask], dim=-1)

    q, k, v = (t.transpose(1, 2) for t in (q, k, v))
    scores = q @ k.transpose(2, 3) / math.sqrt(dh) + mask
    gate1 = W[f"l{li}.gate1"].view(1, h, 1, 1)
    gate2 = W[f"l{li}.gate2"].view(1, h, 1, 1)
    a_sc = tF.softmax(scores[..., :al].float(), dim=-1) * gate1.tanh()
    vt = scores[..., al:].clone()
    if video_start is not None:
        vt[:, :, video_start + max_feats:, video_start:video_start + max_feats] += gate2
    vt = tF.softmax(vt.float(), dim=-1)
    probs = torch.cat([a_sc, vt], dim=-1)
    out = (probs @ v).transpose(1, 2).reshape(b, s, -1)
    return out @ W[f"l{li}.wo"].T


def t_forward(tokens, video, W, video_start, qav_index=None, qav_mask=None):
    """Full reference-style forward → (h, logits, raw_video_feature)."""
    h = W["tok_embeddings"][tokens]
    vf_raw = video @ W["visual_proj"].T
    vf = vf_raw + W["temporal_emb"][None]
    if qav_index is None:
        h = h.clone()
        for bi in range(h.shape[0]):
            h[bi, video_start:video_start + F] = vf[bi]
    else:
        h = h * (~qav_mask[..., None])
        h = h.scatter_add(1, qav_index[..., None].repeat(1, 1, CFG.dim), vf)
    freqs = t_freqs_cis(CFG.head_dim, S)
    mask = torch.full((1, 1, S, S), float("-inf")).triu(1)
    adapters = W["adapter_query"].reshape(CFG.adapter_layer, CFG.adapter_len,
                                          CFG.dim)
    for li in range(CFG.n_layers):
        a = adapters[li]
        hn = t_rmsnorm(h, W[f"l{li}.attention_norm"], CFG.norm_eps)
        h = h + t_attention(hn, W, li, freqs, mask, a,
                            video_start if qav_index is None else None, F)
        hn = t_rmsnorm(h, W[f"l{li}.ffn_norm"], CFG.norm_eps)
        ff = (tF.silu(hn @ W[f"l{li}.w1"].T) * (hn @ W[f"l{li}.w3"].T)) @ W[f"l{li}.w2"].T
        h = h + ff
    h = t_rmsnorm(h, W["norm"], CFG.norm_eps)
    return h, h @ W["output"].T, vf_raw


# --- weight plumbing ----------------------------------------------------------

def make_jax_model():
    return FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                           trainable_dtype=jnp.float32)


@pytest.fixture(scope="module")
def weights():
    model = make_jax_model()
    rng = jax.random.PRNGKey(42)
    tokens = jax.random.randint(rng, (B, S), 0, CFG.vocab_size)
    video = jax.random.normal(rng, (B, F, CFG.visual_dim))
    vs = jnp.full((B,), 5, jnp.int32)
    splice = vs[:, None] + jnp.arange(F)[None]
    params = model.init(jax.random.PRNGKey(7), tokens, video, None, vs, splice)
    # overwrite gates with nonzero values so both segments contribute
    p = params["params"]
    for li in range(CFG.n_layers):
        lp = p[f"layers_{li}"]["attention"]
        lp["gate1"] = 0.3 * (1.0 + jnp.arange(CFG.n_heads, dtype=jnp.float32))
        lp["gate2"] = -1.5 + 0.2 * jnp.arange(CFG.n_heads, dtype=jnp.float32)
    params = {"params": p}

    W = {}
    W["tok_embeddings"] = torch.tensor(np.asarray(p["tok_embeddings"]["embedding"]))
    W["visual_proj"] = torch.tensor(np.asarray(p["visual_proj"]["kernel"])).T
    W["temporal_emb"] = torch.tensor(np.asarray(p["temporal_emb"]))
    W["adapter_query"] = torch.tensor(np.asarray(p["adapter_query"]))
    W["norm"] = torch.tensor(np.asarray(p["norm"]["weight"]))
    W["output"] = torch.tensor(np.asarray(p["output"]["kernel"])).T
    for li in range(CFG.n_layers):
        lp = p[f"layers_{li}"]
        for w in ("wq", "wk", "wv", "wo"):
            W[f"l{li}.{w}"] = torch.tensor(np.asarray(lp["attention"][w]["kernel"])).T
        for w in ("w1", "w2", "w3"):
            W[f"l{li}.{w}"] = torch.tensor(np.asarray(lp["feed_forward"][w]["kernel"])).T
        W[f"l{li}.gate1"] = torch.tensor(np.asarray(lp["attention"]["gate1"]))
        W[f"l{li}.gate2"] = torch.tensor(np.asarray(lp["attention"]["gate2"]))
        W[f"l{li}.attention_norm"] = torch.tensor(
            np.asarray(lp["attention_norm"]["weight"]))
        W[f"l{li}.ffn_norm"] = torch.tensor(np.asarray(lp["ffn_norm"]["weight"]))
    data = dict(tokens=np.asarray(tokens), video=np.asarray(video))
    return params, W, data


# --- unit parity --------------------------------------------------------------

def test_rmsnorm_parity():
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16).astype(np.float32)
    ours = rms_norm(jnp.array(x), jnp.array(w), 1e-5)
    ref = t_rmsnorm(torch.tensor(x), torch.tensor(w), 1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6, atol=1e-6)


def test_rope_parity():
    x = np.random.RandomState(0).randn(2, 8, 4, 16).astype(np.float32)
    cos, sin = precompute_rope(16, 8)
    ours = apply_rope(jnp.array(x), cos, sin)
    ref = t_rope(torch.tensor(x), t_freqs_cis(16, 8))
    # torch computes the rotation via complex polar(), jax via cos/sin —
    # different libm paths, so agreement is to ~1e-5 absolute in f32.
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=5e-5)


def test_two_segment_attention_parity():
    rs = np.random.RandomState(3)
    h, dh, al = 4, 8, 5
    q = rs.randn(B, S, h, dh).astype(np.float32)
    k = rs.randn(B, S, h, dh).astype(np.float32)
    v = rs.randn(B, S, h, dh).astype(np.float32)
    ak = rs.randn(al, h, dh).astype(np.float32)
    av = rs.randn(al, h, dh).astype(np.float32)
    g1 = rs.randn(h).astype(np.float32)
    g2 = rs.randn(h).astype(np.float32)
    vs = 4

    ours = adapter_gated_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(ak),
        jnp.array(av), jnp.array(g1), jnp.array(g2),
        jnp.full((B,), vs, jnp.int32), F)

    # torch: concatenated two-segment formulation (no rope/projections here)
    tq, tk, tv = (torch.tensor(t).transpose(1, 2) for t in (q, k, v))
    tak = torch.tensor(ak).permute(1, 0, 2)[None].repeat(B, 1, 1, 1)
    tav = torch.tensor(av).permute(1, 0, 2)[None].repeat(B, 1, 1, 1)
    tk = torch.cat([tak, tk], dim=2)
    tv = torch.cat([tav, tv], dim=2)
    mask = torch.full((1, 1, S, S), float("-inf")).triu(1)
    mask = torch.cat([torch.zeros(1, 1, S, al), mask], dim=-1)
    scores = tq @ tk.transpose(2, 3) / math.sqrt(dh) + mask
    a_p = tF.softmax(scores[..., :al], dim=-1) * torch.tensor(g1).view(1, h, 1, 1).tanh()
    vt = scores[..., al:].clone()
    vt[:, :, vs + F:, vs:vs + F] += torch.tensor(g2).view(1, h, 1, 1)
    vt = tF.softmax(vt, dim=-1)
    probs = torch.cat([a_p, vt], dim=-1)
    ref = (probs @ tv).transpose(1, 2).reshape(B, S, h * dh)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=RTOL, atol=ATOL)


def test_attention_no_video_block_matches_plain(weights):
    """video_start=-1 must equal the reference's video_start=None path."""
    rs = np.random.RandomState(5)
    h, dh, al = 4, 8, 5
    args = [rs.randn(B, S, h, dh).astype(np.float32) for _ in range(3)]
    ak = rs.randn(al, h, dh).astype(np.float32)
    av = rs.randn(al, h, dh).astype(np.float32)
    g1 = rs.randn(h).astype(np.float32)
    g2 = rs.randn(h).astype(np.float32)
    off = adapter_gated_attention(*map(jnp.array, args), jnp.array(ak),
                                  jnp.array(av), jnp.array(g1), jnp.array(g2),
                                  jnp.full((B,), -1, jnp.int32), F)
    zero_g2 = adapter_gated_attention(*map(jnp.array, args), jnp.array(ak),
                                      jnp.array(av), jnp.array(g1),
                                      jnp.zeros(h), jnp.full((B,), 0, jnp.int32), 0)
    np.testing.assert_allclose(np.asarray(off), np.asarray(zero_g2),
                               rtol=RTOL, atol=ATOL)


# --- end-to-end parity --------------------------------------------------------

def test_full_forward_parity_vqa(weights):
    params, W, data = weights
    model = make_jax_model()
    tokens = jnp.array(data["tokens"])
    video = jnp.array(data["video"])
    vs_scalar = 5
    vs = jnp.full((B,), vs_scalar, jnp.int32)
    splice = vs[:, None] + jnp.arange(F)[None]

    logits, _ = model.apply(params, tokens, video, None, vs, splice)

    t_tokens = torch.tensor(data["tokens"]).long()
    t_video = torch.tensor(data["video"])
    _, ref_logits, _ = t_forward(t_tokens, t_video, W, vs_scalar)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=5e-4, atol=5e-4)


def test_full_forward_parity_qav(weights):
    """QAV: scatter splice at per-example positions, no gate2 block."""
    params, W, data = weights
    model = make_jax_model()
    tokens = jnp.array(data["tokens"])
    video = jnp.array(data["video"])
    prefix = np.array([7, 9])
    splice = jnp.array(prefix[:, None] + np.arange(F)[None], jnp.int32)
    vs = jnp.full((B,), -1, jnp.int32)  # sentinel: no video-block bias

    vf = model.apply(params, video, None, method=FlippedVQAModel.fuse)
    h = model.apply(params, tokens, vf, vs, splice,
                    method=FlippedVQAModel.encode)
    qav = model.apply(params, h, vf, method=FlippedVQAModel.qav_logits)

    t_tokens = torch.tensor(data["tokens"]).long()
    t_video = torch.tensor(data["video"])
    qav_index = torch.tensor(np.stack([p + np.arange(F) for p in prefix])).long()
    qav_mask = torch.zeros(B, S, dtype=torch.bool)
    for bi, p in enumerate(prefix):
        qav_mask[bi, p:p + F] = True
    h_ref, _, vf_ref = t_forward(t_tokens, t_video, W, None, qav_index, qav_mask)
    ref_qav = (h_ref[:, :-1] @ vf_ref.transpose(1, 2)) / CFG.tau
    np.testing.assert_allclose(np.asarray(qav), ref_qav.numpy(),
                               rtol=5e-4, atol=5e-4)
