"""Residual-stream rotation for outlier-immune quantization (QuaRot-style).

Per-channel absmax int8 breaks when a few residual channels carry
outsized magnitudes (the LLM.int8() emergent-outlier structure; measured in
scripts/int8_parity_study.py --weights outlier: 60% eval-decision flips,
diverging training). The grouped / passthrough variants (--quantize
int8g|w8a8g|int8o|w8a8o) only *contain* the damage. This module removes the
failure mode instead: conjugate the entire residual stream by a random
orthogonal rotation R, folded OFFLINE into the checkpoint —

    h' = h R          (every vector living in the residual stream)

which is exact because RMSNorm commutes with orthogonal maps once its
per-channel weight is folded into the adjacent matmuls (||hR|| = ||h||, and
the norm's mean-square uses the rotation-invariant L2 norm). R spreads any
outlier channel's energy across all d channels (incoherence processing),
so the rotated weights/activations are near-Gaussian and PLAIN absmax
scales recover bf16-grade behavior at FULL w8a8 speed — no grouped scales,
no passthrough matmul (the study's int8r/w8a8r phases quantify this).

Folded transforms (kernel layout (in, out), y = x @ K; R = diag(s)·H/√d
with random signs s and the Sylvester-Hadamard H, so folding is O(d·log d)
per vector via the fast Walsh-Hadamard transform — rotating a full 7B tree
is minutes of host time, not hours of d×d matmuls):

    tok_embeddings   E' = E R
    attention_norm   γa → 1;  wq/wk/wv: K' = Rᵀ diag(γa) K   (q/k/v values
                     are bit-identical to the unrotated model — RoPE, the
                     gates and the Pallas kernels see the same tensors)
    wo               K' = K R                   (writes the residual)
    ffn_norm         γf → 1;  w1/w3: K' = Rᵀ diag(γf) K
    w2               K' = K R
    norm             γn → 1;  output: K' = Rᵀ diag(γn) K
    temporal_emb     T' = T R
    visual/audio_proj (features == dim)  K' = K R
    adapter_query    a'_l = a_l diag(γa_l)⁻¹ R  (adapters feed wk/wv RAW —
                     reference model.py:87-89 applies no norm — so the
                     folded γ must be pre-divided out per adapter layer)
    qav_rot          Rᵀ diag(γn) R — the QAV head consumes norm(h)·vfᵀ
                     directly (reference model.py:358-361), the one place
                     the folded final γ must be restored at runtime; H's
                     symmetry makes this matrix symmetric, so the model
                     applies it to vf (model/llama.py:qav_logits).

The hidden (SwiGLU) axis of w1/w3 outputs and w2 inputs is NOT rotated —
that would need an online Hadamard per FFN (QuaRot's R4). Residual-stream
outliers — the emergent kind — are fully covered; see docs/PERF.md.

Everything here is host-side numpy on the UNQUANTIZED tree; quantization
(ckpt/quantize.py) runs after. Rotation is deterministic in `seed`, so a
resumed/evaluated run rebuilds the identical rotated frozen tree from the
same base checkpoint.
"""
from __future__ import annotations

import numpy as np

# Fixed default so train / resume / evaluate derive the same rotation
# without storing R (only `seed` would need to travel with a run that
# overrides it).
DEFAULT_SEED = 0


def _sylvester(d: int) -> np.ndarray:
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    return h


def fwht(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Unnormalized fast Walsh-Hadamard transform along `axis`
    (y = x·H with the Sylvester Hadamard matrix; H is symmetric).
    Requires a power-of-two length.

    Uses the Kronecker factorization H_{ab} = H_a ⊗ H_b (Sylvester
    H_{2^k} = H_2^{⊗k}): a length-d vector viewed row-major as an (a, b)
    matrix V transforms as H_a · V · H_b — two small BLAS matmuls instead
    of log2(d) strided butterfly passes (~50× faster on the 1-core host;
    folding a full 7B tree drops from hours to ~2 minutes)."""
    x = np.moveaxis(np.asarray(x, np.float32), axis, -1)
    shape = x.shape
    d = shape[-1]
    if d & (d - 1):
        raise ValueError(f"fwht needs a power-of-two length, got {d}")
    k = d.bit_length() - 1
    a = 1 << ((k + 1) // 2)
    b = d // a
    ha, hb = _sylvester(a), _sylvester(b)
    # (H_a ⊗ H_b)·vec(V) == H_a V H_b row-major; run each factor as ONE
    # large GEMM (batched (64,64) matmuls are strided-slow in numpy)
    y = (x.reshape(-1, b) @ hb).reshape(-1, a, b)
    y = (np.swapaxes(y, 1, 2).reshape(-1, a) @ ha).reshape(-1, b, a)
    y = np.swapaxes(y, 1, 2)
    return np.moveaxis(y.reshape(shape), -1, axis)


class Rotation:
    """A random orthogonal rotation of R^dim with fast one-sided folding.

    Power-of-two dims use R = diag(signs)·H/√d (FWHT-fast); other dims fall
    back to an explicit QR-orthogonalized Gaussian matrix.
    """

    def __init__(self, dim: int, seed: int = DEFAULT_SEED):
        self.dim = dim
        rs = np.random.RandomState(seed)
        if dim & (dim - 1) == 0:
            self.signs = rs.choice(np.float32([-1.0, 1.0]), dim)
            self.q = None
        else:
            self.signs = None
            self.q = np.linalg.qr(
                rs.randn(dim, dim).astype(np.float64))[0].astype(np.float32)

    # -- primitive folds ----------------------------------------------------
    def right(self, m: np.ndarray) -> np.ndarray:
        """m @ R — rotate the LAST axis (rows living in the residual
        stream: embeddings, temporal_emb, and the output side of kernels
        that write the residual: wo, w2, visual/audio_proj)."""
        m = np.asarray(m, np.float32)
        if self.q is not None:
            return m @ self.q
        return fwht(m * self.signs, axis=-1) / np.sqrt(self.dim)

    def left_t(self, k: np.ndarray, gamma=None) -> np.ndarray:
        """Rᵀ · diag(gamma) · k — fold a preceding RMSNorm weight and
        rotate the INPUT axis (axis 0) of a kernel reading the residual."""
        k = np.asarray(k, np.float32)
        if gamma is not None:
            k = k * np.asarray(gamma, np.float32)[:, None]
        if self.q is not None:
            return self.q.T @ k
        return fwht(k * self.signs[:, None], axis=0) / np.sqrt(self.dim)

    def conjugate_diag(self, gamma) -> np.ndarray:
        """Rᵀ diag(gamma) R (symmetric) — the runtime `qav_rot` matrix."""
        g = np.asarray(gamma, np.float32)
        if self.q is not None:
            return self.q.T @ (g[:, None] * self.q)
        # signs cancel: diag(s)·diag(γ)·diag(s) = diag(γ)
        m = fwht(np.diag(g), axis=0)
        return fwht(m, axis=1) / self.dim

    def matrix(self) -> np.ndarray:
        """Explicit R (tests / small dims only)."""
        if self.q is not None:
            return self.q
        return self.right(np.eye(self.dim, dtype=np.float32))


def _cast_like(x: np.ndarray, ref) -> np.ndarray:
    import jax.numpy as jnp
    return jnp.asarray(x).astype(ref.dtype)


def rotate_params(params: dict, n_layers: int, adapter_layer: int = 0,
                  seed: int = DEFAULT_SEED):
    """Fold a residual-stream rotation into an UNQUANTIZED param tree.

    `params` may be the full merged tree (equivalence tests, the parity
    study) or the frozen-only checkpoint tree from ckpt/convert.py (the
    builder path) — absent/None leaves are skipped, but a kernel whose
    folding needs a norm weight requires that norm to be present. Returns a
    new tree with all norm weights at 1, `qav_rot` added, and — when the
    trainable leaves are present — adapter_query / temporal_emb /
    visual_proj / audio_proj rotated so the rotated model is EXACTLY
    equivalent to the original (tests/test_rotate.py).
    """
    def has(node, key):
        return isinstance(node, dict) and node.get(key) is not None

    def _no_quantized(node):
        if isinstance(node, dict):
            if "kernel_q" in node or "kernel_q4" in node:
                raise ValueError(
                    "rotate_params got a QUANTIZED tree (kernel_q/kernel_q4 "
                    "leaf found) — the rotation must fold into the bf16/f32 "
                    "kernels BEFORE quantization (ckpt/quantize.py runs "
                    "after)")
            for v in node.values():
                _no_quantized(v)

    _no_quantized(params)

    out = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in params.items()}
    dim = None
    for i in range(n_layers):
        lay = out.get(f"layers_{i}")
        if has(lay, "attention"):
            dim = np.shape(lay["attention"]["wq"]["kernel"])[0]
            break
    if dim is None and has(out.get("norm"), "weight"):
        dim = np.shape(out["norm"]["weight"])[0]
    if dim is None:
        raise ValueError("rotate_params: no layer kernels or final norm "
                         "found — cannot infer the residual dim")
    rot = Rotation(dim, seed)

    if has(out.get("tok_embeddings"), "embedding"):
        e = out["tok_embeddings"]["embedding"]
        out["tok_embeddings"] = {
            **out["tok_embeddings"], "embedding": _cast_like(rot.right(np.asarray(e, np.float32)), e)}

    gammas_attn = {}
    for i in range(n_layers):
        name = f"layers_{i}"
        lay = out.get(name)
        if not isinstance(lay, dict):
            continue
        lay = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in lay.items()}
        out[name] = lay
        attn = lay.get("attention")
        ga = (np.asarray(lay["attention_norm"]["weight"], np.float32)
              if has(lay.get("attention_norm"), "weight") else None)
        if ga is not None:
            gammas_attn[i] = ga
        if has(attn, "wq"):
            if ga is None:
                raise ValueError(f"{name}: attention kernels present but "
                                 f"attention_norm.weight missing — cannot "
                                 f"fold the rotation")
            attn = dict(attn)
            for w in ("wq", "wk", "wv"):
                k = attn[w]["kernel"]
                attn[w] = {**attn[w],
                           "kernel": _cast_like(rot.left_t(k, ga), k)}
            ko = attn["wo"]["kernel"]
            attn["wo"] = {**attn["wo"],
                          "kernel": _cast_like(rot.right(ko), ko)}
            lay["attention"] = attn
            lay["attention_norm"] = {
                "weight": _cast_like(np.ones(dim, np.float32),
                                     lay["attention_norm"]["weight"])}
        ff = lay.get("feed_forward")
        if has(ff, "w1"):
            if not has(lay.get("ffn_norm"), "weight"):
                raise ValueError(f"{name}: FFN kernels present but "
                                 f"ffn_norm.weight missing")
            gf = np.asarray(lay["ffn_norm"]["weight"], np.float32)
            ff = dict(ff)
            for w in ("w1", "w3"):
                k = ff[w]["kernel"]
                ff[w] = {**ff[w], "kernel": _cast_like(rot.left_t(k, gf), k)}
            k2 = ff["w2"]["kernel"]
            ff["w2"] = {**ff["w2"], "kernel": _cast_like(rot.right(k2), k2)}
            lay["feed_forward"] = ff
            lay["ffn_norm"] = {
                "weight": _cast_like(np.ones(dim, np.float32),
                                     lay["ffn_norm"]["weight"])}

    if not has(out.get("norm"), "weight"):
        raise ValueError("rotate_params: final norm.weight missing — needed "
                         "for the output head fold and qav_rot")
    gn = np.asarray(out["norm"]["weight"], np.float32)
    if has(out.get("output"), "kernel"):
        k = out["output"]["kernel"]
        out["output"] = {**out["output"],
                         "kernel": _cast_like(rot.left_t(k, gn), k)}
    out["norm"] = {"weight": _cast_like(np.ones(dim, np.float32),
                                        out["norm"]["weight"])}
    import jax.numpy as jnp
    out["qav_rot"] = jnp.asarray(rot.conjugate_diag(gn), jnp.float32)

    # trainables (present in merged trees; absent in frozen checkpoints)
    if out.get("temporal_emb") is not None:
        t = out["temporal_emb"]
        out["temporal_emb"] = _cast_like(rot.right(np.asarray(t, np.float32)),
                                         t)
    for proj in ("visual_proj", "audio_proj"):
        node = out.get(proj)
        if has(node, "kernel") and np.shape(node["kernel"])[-1] == dim:
            k = node["kernel"]
            out[proj] = {**node, "kernel": _cast_like(rot.right(k), k)}
    if out.get("adapter_query") is not None:
        if adapter_layer <= 0:
            raise ValueError("adapter_query present — pass the model's "
                             "adapter_layer so rows pair with the right "
                             "attention_norm γ (model/llama.py:"
                             "_active_blocks pairs them with the LAST "
                             "adapter_layer blocks)")
        a = np.asarray(out["adapter_query"], np.float32)
        alen = a.shape[0] // adapter_layer
        first = n_layers - adapter_layer
        blocks = []
        for j in range(adapter_layer):
            ga = gammas_attn.get(first + j)
            if ga is None:
                raise ValueError(f"adapter_query present but layers_"
                                 f"{first + j}.attention_norm is missing")
            if np.any(ga == 0):
                raise ValueError("attention_norm weight has exact zeros — "
                                 "cannot invert the fold for adapter_query")
            blocks.append(rot.right(a[j * alen:(j + 1) * alen] / ga[None, :]))
        out["adapter_query"] = _cast_like(np.concatenate(blocks, axis=0),
                                          out["adapter_query"])
    return out
