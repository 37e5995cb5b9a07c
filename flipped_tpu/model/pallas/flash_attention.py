"""Pallas TPU flash attention for the adapter-gated two-segment softmax.

The reference attention (reference: llama/model.py:111-126) softmaxes the
adapter segment and the text segment independently, then concatenates — so
the output decomposes exactly into:

    out = softmax(q·k_adapterᵀ)·tanh(gate1) @ v_adapter    (tiny: L=10 keys)
        + softmax(q·k_textᵀ + causal + gate2·block) @ v_text

Segment B is the O(S²) hot path; this module streams it through a Pallas
kernel that never materializes the (B, H, S, S) probability tensor in HBM:
the grid walks (batch, head, q-block) and each program holds one q-block and
the full K/V for its (batch, head) in VMEM (S ≤ ~1k for this workload, so
K/V fit comfortably; a K-blocked online-softmax variant is unnecessary).
The video-block gate2 bias (rows ≥ vs+F) × (vs ≤ cols < vs+F)
(reference: model.py:116-119) is regenerated inside the kernel from the
per-sequence scalar `video_start` — no bias tensor ever exists.

Gradients: the op is wrapped in jax.custom_vjp; the backward pass recomputes
through the exact einsum formulation (attention.py), which XLA fuses — the
Pallas kernel accelerates the forward (and the remat'd forward inside the
backward of rematerialized blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..attention import adapter_gated_attention

try:  # Pallas is TPU/GPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

NEG_INF = -1e30

# Set True (tests) to run the kernels through the Pallas interpreter on CPU.
INTERPRET = False

# Designed VMEM bounds (v5e ~128 MiB/core). The workload's longest recipe is
# S=650 (TVQA); these enforce the design notes instead of an opaque
# compile-time OOM. fwd holds K/V (S_pad × Dh_pad) per program; bwd holds
# ~5 f32 (S_pad × S_pad) matrices.
MAX_SEQ_FWD = 4096
MAX_SEQ_BWD = 2048


def _flash_kernel(vs_ref, gate2_ref, q_ref, k_ref, v_ref, o_ref, *,
                  bq: int, s_actual: int, max_feats: int, scale: float):
    """One (batch, head, q-block) program.

    q_ref: (BQ, Dh)   k_ref/v_ref: (S_pad, Dh)   o_ref: (BQ, Dh)
    vs_ref: (B,) int32 scalar-prefetch; gate2_ref: (H,) f32 scalar-prefetch.
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)

    q = q_ref[:].astype(jnp.bfloat16)
    k = k_ref[:].astype(jnp.bfloat16)
    s_pad = k.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, S_pad)

    row = jax.lax.broadcasted_iota(jnp.int32, (bq, s_pad), 0) + qi * bq
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, s_pad), 1)

    vs = vs_ref[b]
    gate2 = gate2_ref[h]
    # gate2 bias on the (text rows × video cols) block; vs<0 disables it.
    block = ((row >= vs + max_feats) & (col >= vs)
             & (col < vs + max_feats) & (vs >= 0))
    scores = scores + jnp.where(block, gate2, 0.0)
    # causal + key-padding mask
    valid = (col <= row) & (col < s_actual)
    scores = jnp.where(valid, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[:] = jax.lax.dot_general(
        probs.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(x, m):
    return (x + m - 1) // m * m


def flash_text_attention(q, k, v, gate2, video_start, max_feats,
                         block_q: int = 128, interpret: bool | None = None):
    """Causal attention + gate2 video-block bias via Pallas.

    q, k, v: (B, S, H, Dh); gate2: (H,); video_start: (B,) int32 (-1 → off).
    Returns (B, S, H, Dh) in q.dtype.
    """
    interpret = INTERPRET if interpret is None else interpret
    b, s, h, dh = q.shape
    if s > MAX_SEQ_FWD:
        raise ValueError(
            f"flash_text_attention holds full K/V per (batch, head) in VMEM "
            f"— S={s} exceeds the designed bound {MAX_SEQ_FWD}; a K-blocked "
            f"online-softmax variant is needed beyond it")
    scale = 1.0 / float(np.sqrt(dh))
    s_pad = _round_up(s, 128)
    bq = min(block_q, s_pad)
    dh_pad = _round_up(dh, 128)

    qt = _pad_to(_pad_to(q.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)
    kt = _pad_to(_pad_to(k.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)
    vt = _pad_to(_pad_to(v.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)

    grid = (b, h, s_pad // bq)
    kernel = functools.partial(_flash_kernel, bq=bq, s_actual=s,
                               max_feats=max_feats, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s_pad, dh_pad),
                         lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, dh_pad),
                         lambda bi, hi, qi, *_: (bi, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, dh_pad),
                               lambda bi, hi, qi, *_: (bi, hi, qi, 0)),
    )

    def kernel_4d(vs_ref, g2_ref, q_ref, k_ref, v_ref, o_ref):
        kernel(vs_ref, g2_ref, q_ref.at[0, 0], k_ref.at[0, 0],
               v_ref.at[0, 0], o_ref.at[0, 0])

    out = pl.pallas_call(
        kernel_4d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * dh,
            bytes_accessed=(3 * b * h * s * dh + b * h * s * dh) * 2,
            transcendentals=b * h * s * s,
        ),
    )(video_start.astype(jnp.int32), gate2.astype(jnp.float32), qt, kt, vt)

    return out[:, :, :s, :dh].transpose(0, 2, 1, 3)


def _flash_bwd_kernel(vs_ref, gate2_ref, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, dg2_ref, *,
                      s_actual: int, max_feats: int, scale: float):
    """Backward for the text segment, one (batch, head) per program.

    For this workload S ≤ ~1k, so the full (S_pad, S_pad) probability matrix
    fits in VMEM — the backward is five MXU matmuls with no online-softmax
    bookkeeping:
        P  = softmax(qKᵀ·scale + gate2·block + causal)
        D  = rowsum(dO ∘ (P V))
        dS = P ∘ (P dOVᵀ-wise: dP − D)
        dq = dS K · scale,  dk = dSᵀ Q · scale,  dv = Pᵀ dO
        dgate2 = Σ_block dS           (bias is additive pre-softmax)
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    q = q_ref[:].astype(jnp.bfloat16)
    k = k_ref[:].astype(jnp.bfloat16)
    v = v_ref[:].astype(jnp.bfloat16)
    do = do_ref[:].astype(jnp.bfloat16)
    s_pad = q.shape[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale

    row = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    vs = vs_ref[b]
    gate2 = gate2_ref[h]
    block = ((row >= vs + max_feats) & (col >= vs)
             & (col < vs + max_feats) & (vs >= 0))
    scores = scores + jnp.where(block, gate2, 0.0)
    valid = (col <= row) & (col < s_actual) & (row < s_actual)
    scores = jnp.where(valid, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)            # (S_pad, S_pad) f32
    p_bf = p.astype(jnp.bfloat16)

    o = jax.lax.dot_general(p_bf, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d = jnp.sum(o * do.astype(jnp.float32), axis=-1, keepdims=True)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - d)                               # (S_pad, S_pad) f32
    ds = jnp.where(valid, ds, 0.0)
    ds_bf = ds.astype(jnp.bfloat16)

    dq_ref[:] = (jax.lax.dot_general(
        ds_bf, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[:] = (jax.lax.dot_general(
        ds_bf, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
    dv_ref[:] = jax.lax.dot_general(
        p_bf, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # full (B,H) SMEM block shared across programs; each writes its own cell
    dg2_ref[b, h] = jnp.sum(jnp.where(block, ds, 0.0))


def flash_text_attention_bwd(q, k, v, gate2, video_start, max_feats, g,
                             interpret: bool | None = None):
    """Pallas backward for flash_text_attention.

    q,k,v,g: (B, S, H, Dh); returns (dq, dk, dv, dgate2)."""
    interpret = INTERPRET if interpret is None else interpret
    b, s, h, dh = q.shape
    if s > MAX_SEQ_BWD:
        raise ValueError(
            f"flash_text_attention_bwd materializes the full (S_pad, S_pad) "
            f"probability matrix in VMEM — S={s} exceeds the designed bound "
            f"{MAX_SEQ_BWD} (~5 f32 S×S buffers ≈ "
            f"{5 * _round_up(s, 128) ** 2 * 4 >> 20} MiB vs ~128 MiB VMEM); "
            f"use a kq-blocked backward beyond it")
    scale = 1.0 / float(np.sqrt(dh))
    s_pad = _round_up(s, 128)
    dh_pad = _round_up(dh, 128)

    def prep(x):
        return _pad_to(_pad_to(x.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)

    qt, kt, vt, gt = prep(q), prep(k), prep(v), prep(g)
    kernel = functools.partial(_flash_bwd_kernel, s_actual=s,
                               max_feats=max_feats, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, h),
        in_specs=[pl.BlockSpec((1, 1, s_pad, dh_pad),
                               lambda bi, hi, *_: (bi, hi, 0, 0))] * 4,
        out_specs=[
            pl.BlockSpec((1, 1, s_pad, dh_pad),
                         lambda bi, hi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, dh_pad),
                         lambda bi, hi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, s_pad, dh_pad),
                         lambda bi, hi, *_: (bi, hi, 0, 0)),
            pl.BlockSpec((b, h), lambda bi, hi, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
    )

    def kernel_4d(vs_ref, g2_ref, q_ref, k_ref, v_ref, do_ref,
                  dq_ref, dk_ref, dv_ref, dg2_ref):
        kernel(vs_ref, g2_ref, q_ref.at[0, 0], k_ref.at[0, 0],
               v_ref.at[0, 0], do_ref.at[0, 0], dq_ref.at[0, 0],
               dk_ref.at[0, 0], dv_ref.at[0, 0], dg2_ref)

    dq, dk, dv, dg2 = pl.pallas_call(
        kernel_4d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s * s * dh,
            bytes_accessed=7 * b * h * s * dh * 2,
            transcendentals=b * h * s * s,
        ),
    )(video_start.astype(jnp.int32), gate2.astype(jnp.float32),
      qt, kt, vt, gt)

    unprep = lambda x: x[:, :, :s, :dh].transpose(0, 2, 1, 3)
    return unprep(dq), unprep(dk), unprep(dv), dg2.sum(axis=0)


def _adapter_segment(q, adapter_k, adapter_v, gate1):
    """Exact tiny attention over the adapter prefix, recombined outside the
    kernel — the shared implementation lives in model/attention.py."""
    from ..attention import adapter_prefix_attention

    return adapter_prefix_attention(q, adapter_k, adapter_v, gate1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1, gate2,
                             video_start, max_feats):
    text = flash_text_attention(q, k, v, gate2, video_start, max_feats)
    out = text + _adapter_segment(q, adapter_k, adapter_v, gate1)
    b, s, h, dh = q.shape
    return out.reshape(b, s, h * dh)


def _fwd(q, k, v, adapter_k, adapter_v, gate1, gate2, video_start, max_feats):
    out = _flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1,
                                   gate2, video_start, max_feats)
    return out, (q, k, v, adapter_k, adapter_v, gate1, gate2, video_start)


def _bwd(max_feats, res, g):
    q, k, v, adapter_k, adapter_v, gate1, gate2, video_start = res
    b, s, h, dh = q.shape
    g4 = g.reshape(b, s, h, dh)
    # text segment: Pallas backward kernel (recompute, no HBM probs)
    dq_t, dk, dv, dg2 = flash_text_attention_bwd(
        q, k, v, gate2, video_start, max_feats, g4)
    # adapter segment: exact tiny attention, autodiffed
    _, avjp = jax.vjp(_adapter_segment, q, adapter_k, adapter_v, gate1)
    dq_a, dak, dav, dg1 = avjp(g4.astype(q.dtype))
    vs_zero = np.zeros(video_start.shape, dtype=jax.dtypes.float0)
    return (dq_t + dq_a, dk, dv, dak, dav, dg1,
            dg2.astype(gate2.dtype), vs_zero)


_flash_adapter_attention.defvjp(_fwd, _bwd)


def flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1, gate2,
                            video_start, max_feats):
    """Drop-in replacement for attention.adapter_gated_attention using the
    Pallas kernel for the O(S²) text segment. Falls back to the exact einsum
    path off-TPU."""
    if not _HAS_PALLAS or jax.default_backend() != "tpu":
        return adapter_gated_attention(q, k, v, adapter_k, adapter_v, gate1,
                                       gate2, video_start, max_feats)
    return _flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1,
                                    gate2, video_start, max_feats)
