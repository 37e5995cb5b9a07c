"""w8a8 matmul: int8 activations × int8 weights on the MXU.

The v5e MXU executes int8×int8→int32 dots at 2× its bf16 FLOP rate
(394 vs 197 TOPS), so quantizing *activations* on the fly — per-token
symmetric absmax, the standard w8a8 recipe — roughly halves the matmul time
of the frozen backbone beyond what weight-only int8 (HBM relief only) gives.

This is an addition over the reference, which runs every matmul in fp16
cuBLAS (llama_vqa.py:63-65). Opt-in via --quantize w8a8.

Backward is exact w.r.t. the *dequantized* weights: a custom VJP returns
dx = g @ (kq·scale)ᵀ in bf16, i.e. bit-identical gradients to the
weight-only int8 path (straight-through the activation rounding). The
frozen backbone has no weight grads, so this is the only cotangent needed.

The LM head stays weight-only (callers choose): logit perturbation feeds
the eval argmin (reference: engine.py:87-93) directly, while hidden-layer
perturbation is damped by the residual stream — see
scripts/int8_parity_study.py --phase w8a8 for the measured envelope.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Per-token scale floor: all-zero rows (padding) divide safely.
_EPS = 1e-8


def _quantize_act(x: jax.Array):
    """(… , K) float → int8 with per-row absmax scales (…, 1) f32."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, _EPS)
    xq = jnp.round(x32 / xs).astype(jnp.int8)  # |x| ≤ amax ⇒ no clip needed
    return xq, xs


def _int8_matmul_fwd_impl(x, kq, scale):
    xq, xs = _quantize_act(x)
    out = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * xs * scale[None, :]).astype(x.dtype)


@jax.custom_vjp
def int8_matmul(x, kq, scale):
    """x (…, K) float; kq (K, N) int8; scale (N,) f32 → (…, N) x.dtype."""
    return _int8_matmul_fwd_impl(x, kq, scale)


def _fwd(x, kq, scale):
    # the output (hence g) carries x's dtype, so no dtype residual is needed
    return _int8_matmul_fwd_impl(x, kq, scale), (kq, scale)


def _bwd(res, g):
    kq, scale = res
    w = kq.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)[None, :]
    dx = (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)
    zero = np.zeros((), jax.dtypes.float0)
    return (dx,
            np.broadcast_to(zero, kq.shape),
            jnp.zeros_like(scale))


int8_matmul.defvjp(_fwd, _bwd)
