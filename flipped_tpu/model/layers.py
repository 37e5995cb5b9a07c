"""Core transformer math: RMSNorm, rotary embeddings, SwiGLU.

Functional JAX re-implementations of the reference ops (reference:
llama/model.py:31-67, 131-142), written TPU-first: rotary embeddings use a
real-valued cos/sin formulation (complex arithmetic is emulated on TPU), and
normalization statistics run in float32 with bf16 in/out, matching the
reference's fp32 islands (model.py:41, 115, 120).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """x * rsqrt(mean(x²) + eps) * weight, stats in f32
    (reference: model.py:31-42)."""
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (normed.astype(x.dtype) * weight.astype(x.dtype))


def precompute_rope(head_dim: int, end: int, theta: float = 10000.0):
    """cos/sin tables of shape (end, head_dim//2), f32.

    Equivalent to the reference's complex `freqs_cis` (model.py:45-50): the
    complex phase e^{i·t·ω} is carried as (cos, sin)."""
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(end, dtype=jnp.float32)
    angles = jnp.outer(t, freqs)
    return jnp.cos(angles), jnp.sin(angles)


def _rope_core(x: jax.Array, c: jax.Array, s: jax.Array) -> jax.Array:
    """Rotate interleaved pairs (x_{2i}, x_{2i+1}) by pre-broadcast
    cos/sin — identical to the reference's complex multiply
    (model.py:61-67: view_as_complex on ... reshape(-1, 2))."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    x_pairs = x32.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = x_pairs[..., 0], x_pairs[..., 1]
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    out = jnp.stack([out0, out1], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, S, H, Dh); cos/sin: (S, Dh//2) — one shared position table."""
    return _rope_core(x, cos[None, :, None, :].astype(jnp.float32),
                      sin[None, :, None, :].astype(jnp.float32))


def apply_rope_at(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, Q, H, Dh); cos/sin: (B, Q, Dh//2) — PER-EXAMPLE position
    tables (KV-cache extend/decode, where each row sits at its own
    absolute position)."""
    return _rope_core(x, cos[:, :, None, :].astype(jnp.float32),
                      sin[:, :, None, :].astype(jnp.float32))


def swiglu(x: jax.Array, w1: jax.Array, w2: jax.Array, w3: jax.Array) -> jax.Array:
    """w2 @ (silu(w1 @ x) * (w3 @ x)) (reference: model.py:141-142).
    Kernels are (in, out)-shaped."""
    h = jax.nn.silu(x @ w1) * (x @ w3)
    return h @ w2


def ffn_hidden_size(dim: int, multiple_of: int) -> int:
    """SwiGLU hidden sizing with multiple_of rounding
    (reference: model.py:132-135)."""
    hidden = int(2 * (4 * dim) / 3)
    return multiple_of * ((hidden + multiple_of - 1) // multiple_of)
