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
import warnings

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

# Dispatch thresholds between the single-pass kernels (full K/V — fwd — or
# full S×S probabilities — bwd — in VMEM; fastest for the workload's recipes,
# max S=650 TVQA) and the streaming K-blocked online-softmax kernels below,
# which have no sequence bound (v5e ~128 MiB VMEM/core). Beyond these, the
# wrappers switch to the streaming variants automatically.
MAX_SEQ_FWD = 4096
MAX_SEQ_BWD = 2048

# Streaming kernel block sizes (square blocks keep one padded S for q and k).
BLOCK_STREAM = 512


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
        # beyond the full-K/V-in-VMEM design point: stream k-blocks with an
        # online softmax instead (no sequence bound)
        out, _ = flash_streaming_fwd(q, k, v, gate2, video_start, max_feats,
                                     interpret=interpret)
        return out
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
        name="flash_fwd",
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
        # full (S_pad, S_pad) probabilities no longer fit VMEM — switch to
        # the two-pass kq-blocked streaming backward (no sequence bound)
        return flash_streaming_bwd(q, k, v, gate2, video_start, max_feats, g,
                                   interpret=interpret)
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
        name="flash_bwd",
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


# ---------------------------------------------------------------------------
# Streaming (K-blocked, online-softmax) kernels — no sequence bound.
#
# The grid walks (batch, head, q-block, k-block) with the k axis innermost;
# TPU grids execute sequentially, so VMEM scratch carries the online-softmax
# state (running max m, normalizer l, unnormalized accumulator) across the
# k sweep of each q-block (SURVEY §5: the rebuild exists to remove the
# reference's O(S²) materialization, model.py:299-300). Causally-dead blocks
# (k entirely above the diagonal) skip their compute via pl.when.
# ---------------------------------------------------------------------------

def _stream_fwd_kernel(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, o_ref,
                       lse_ref, m_scr, l_scr, acc_scr, *, bq: int, bk: int,
                       s_actual: int, max_feats: int, scale: float):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    # global position of this kernel's first q row: nonzero when q is a
    # SEQUENCE SHARD of the global sequence (sequence parallelism — K/V are
    # all-gathered to full length, q stays local)
    q0 = q0_ref[0]

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    # causal skip: this k-block is entirely above the q-block's diagonal
    @pl.when(ki * bk <= q0 + qi * bq + bq - 1)
    def _compute():
        q = q_ref[:].astype(jnp.bfloat16)
        k = k_ref[:].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # (BQ, BK)

        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q0 + qi * bq
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + ki * bk
        vs = vs_ref[b]
        gate2 = g2_ref[h]
        block = ((row >= vs + max_feats) & (col >= vs)
                 & (col < vs + max_feats) & (vs >= 0))
        s = s + jnp.where(block, gate2, 0.0)
        valid = (col <= row) & (col < s_actual)
        s = jnp.where(valid, s, NEG_INF)

        m_prev = m_scr[:]                                      # (BQ, 128)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])                          # (BQ, BK) f32
        l_scr[:] = l_scr[:] * corr + jnp.sum(p, -1, keepdims=True)
        acc_scr[:] = (acc_scr[:] * corr[:, :1]
                      + jax.lax.dot_general(
                          p.astype(jnp.bfloat16),
                          v_ref[:].astype(jnp.bfloat16),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32))
        m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[:] = (acc_scr[:] / jnp.where(l > 0, l, 1.0)).astype(o_ref.dtype)
        # log-sum-exp per row, for the backward's probability recompute.
        # NB: padded rows (row ≥ s_actual) still see their real columns as
        # valid here, so their lse is FINITE garbage — every consumer must
        # re-mask rows (the streaming backward's _stream_scores does).
        # Stored with 8 broadcast lanes: Mosaic requires the block's trailing
        # dims to tile (8, 128) or equal the array dims, so a (…, S) layout
        # with (1, 1, bq) blocks cannot lower.
        lse_ref[0, 0] = (m_scr[:, :8]
                         + jnp.log(jnp.where(l > 0, l, 1.0))[:, :1])


def flash_streaming_fwd(q, k, v, gate2, video_start, max_feats,
                        block: int = BLOCK_STREAM,
                        interpret: bool | None = None, q_offset=None):
    """Streaming causal attention + gate2 video-block bias. No bound on S.

    q, k, v: (B, S, H, Dh). Returns (out (B,S,H,Dh) in q.dtype,
    lse (B,H,S_pad,8) f32 — 8 broadcast lanes, padded S; consumed by the
    backward kernels).

    q_offset (traced int scalar, optional): global position of q's first
    row. Sequence parallelism passes a LOCAL q shard with full-length K/V
    and q_offset = shard_index · S_local; masks and the causal skip then
    use global row positions. K/V may be longer than q in that case."""
    interpret = INTERPRET if interpret is None else interpret
    b, s_q, h, dh = q.shape
    s_k = k.shape[1]
    scale = 1.0 / float(np.sqrt(dh))
    bq = min(block, _round_up(s_q, 128))
    bk = min(block, _round_up(s_k, 128))
    sq_pad = _round_up(s_q, bq)
    sk_pad = _round_up(s_k, bk)
    dh_pad = _round_up(dh, 128)
    q0 = jnp.full((1,), 0 if q_offset is None else q_offset, jnp.int32)

    def prep(x, s_pad):
        return _pad_to(_pad_to(x.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)

    qt, kt, vt = prep(q, sq_pad), prep(k, sk_pad), prep(v, sk_pad)
    grid = (b, h, sq_pad // bq, sk_pad // bk)
    kernel = functools.partial(_stream_fwd_kernel, bq=bq, bk=bk,
                               s_actual=s_k, max_feats=max_feats, scale=scale)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),     # running max
            pltpu.VMEM((bq, 128), jnp.float32),     # running normalizer
            pltpu.VMEM((bq, dh_pad), jnp.float32),  # unnormalized output
        ],
    )

    def kernel_4d(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, o_ref,
                  lse_ref, m_scr, l_scr, acc_scr):
        kernel(vs_ref, g2_ref, q0_ref, q_ref.at[0, 0], k_ref.at[0, 0],
               v_ref.at[0, 0], o_ref.at[0, 0], lse_ref, m_scr, l_scr, acc_scr)

    out, lse = pl.pallas_call(
        kernel_4d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, dh_pad), q.dtype),
            # (B, H, S_pad, 8): 8 broadcast lanes, see _finalize above
            jax.ShapeDtypeStruct((b, h, sq_pad, 8), jnp.float32),
        ],
        name="flash_stream_fwd",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * s_q * s_k * dh + b * h * s_q * s_k * dh,
            bytes_accessed=(b * h * s_q * dh * 2 + 2 * b * h * s_k * dh * 2
                            + b * h * s_q * dh * 2),
            transcendentals=b * h * s_q * s_k,
        ),
    )(video_start.astype(jnp.int32), gate2.astype(jnp.float32), q0,
      qt, kt, vt)

    return out[:, :, :s_q, :dh].transpose(0, 2, 1, 3), lse


def _stream_scores(vs, gate2, q, k, row0, col0, bq, bk, col_hi, row_hi,
                   max_feats, scale):
    """Shared score/mask construction for the streaming backward kernels.
    `vs`/`gate2` are VALUES read from the scalar-prefetch refs at kernel top
    level (pl.program_id must not be called inside pl.when closures — the
    interpreter cannot lower it there). row0/row_hi are GLOBAL row
    positions (row0 includes the sequence-parallel q_offset; row_hi is
    q_offset + the local q length, bounding padded q rows out of dk/dv).
    Returns (scores f32 with bias applied, valid mask, gate2-block mask)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + row0
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + col0
    block = ((row >= vs + max_feats) & (col >= vs)
             & (col < vs + max_feats) & (vs >= 0))
    s = s + jnp.where(block, gate2, 0.0)
    valid = (col <= row) & (col < col_hi) & (row < row_hi)
    return s, valid, block


def _stream_dq_kernel(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, do_ref,
                      lse_ref, dd_ref, dq_ref, dg2_ref, dq_scr, dg2_scr, *,
                      bq: int, bk: int, s_k: int, s_q: int, max_feats: int,
                      scale: float):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nq = pl.num_programs(2)
    nk = pl.num_programs(3)
    vs = vs_ref[b]
    gate2 = g2_ref[h]
    q0 = q0_ref[0]

    @pl.when((qi == 0) & (ki == 0))
    def _init_g2():
        dg2_scr[0] = 0.0

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr[:])

    @pl.when(ki * bk <= q0 + qi * bq + bq - 1)
    def _compute():
        q = q_ref[:].astype(jnp.bfloat16)
        k = k_ref[:].astype(jnp.bfloat16)
        v = v_ref[:].astype(jnp.bfloat16)
        do = do_ref[:].astype(jnp.bfloat16)
        s, valid, block = _stream_scores(vs, gate2, q, k, q0 + qi * bq,
                                         ki * bk, bq, bk, s_k, q0 + s_q,
                                         max_feats, scale)
        lse = lse_ref[0, 0][:, :1]                            # (BQ, 1)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)           # (BQ, BK) f32
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dd = dd_ref[0, 0][:, :1]
        ds = p * (dp - dd)
        dg2_scr[0] += jnp.sum(jnp.where(block, ds, 0.0))
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype)

    @pl.when((qi == nq - 1) & (ki == nk - 1))
    def _finalize_g2():
        dg2_ref[b, h] = dg2_scr[0]


def _stream_dkv_kernel(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, do_ref,
                       lse_ref, dd_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                       bq: int, bk: int, s_k: int, s_q: int, max_feats: int,
                       scale: float):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    vs = vs_ref[b]
    gate2 = g2_ref[h]
    q0 = q0_ref[0]

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr[:])
        dv_scr[:] = jnp.zeros_like(dv_scr[:])

    @pl.when(q0 + qi * bq + bq - 1 >= ki * bk)
    def _compute():
        q = q_ref[:].astype(jnp.bfloat16)
        k = k_ref[:].astype(jnp.bfloat16)
        v = v_ref[:].astype(jnp.bfloat16)
        do = do_ref[:].astype(jnp.bfloat16)
        s, valid, _ = _stream_scores(vs, gate2, q, k, q0 + qi * bq, ki * bk,
                                     bq, bk, s_k, q0 + s_q, max_feats, scale)
        lse = lse_ref[0, 0][:, :1]
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dd = dd_ref[0, 0][:, :1]
        ds = p * (dp - dd)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(jnp.bfloat16), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def flash_streaming_bwd(q, k, v, gate2, video_start, max_feats, g,
                        o_text=None, lse=None, block: int = BLOCK_STREAM,
                        interpret: bool | None = None, q_offset=None):
    """Streaming backward: two K/Q-blocked passes (dq+dgate2, then dk/dv),
    each holding only block-sized tiles in VMEM. No bound on S.

    o_text/lse: the text-segment forward output and its row log-sum-exps
    (saved by the custom VJP's forward); recomputed here when absent.

    q_offset (traced int scalar, optional): sequence parallelism — q/g are
    a LOCAL shard of the global rows starting at q_offset, K/V are full
    length. dq comes back local; dk/dv come back FULL-length PARTIAL sums
    (this shard's q rows only) and dgate2 partial — the caller must psum
    them over the sequence axis."""
    interpret = INTERPRET if interpret is None else interpret
    b, s_q, h, dh = q.shape
    s_k = k.shape[1]
    scale = 1.0 / float(np.sqrt(dh))
    bq = min(block, _round_up(s_q, 128))
    bk = min(block, _round_up(s_k, 128))
    sq_pad = _round_up(s_q, bq)
    sk_pad = _round_up(s_k, bk)
    dh_pad = _round_up(dh, 128)
    q0 = jnp.full((1,), 0 if q_offset is None else q_offset, jnp.int32)

    if lse is None or o_text is None:
        o_text, lse = flash_streaming_fwd(q, k, v, gate2, video_start,
                                          max_feats, block=block,
                                          interpret=interpret,
                                          q_offset=q_offset)
    # per-row D = Σ_dh dO ∘ O_text (text segment only — the adapter segment
    # has its own independent softmax and VJP). Carried like lse: padded S,
    # 8 broadcast lanes (Mosaic block-tiling rule, see _stream_fwd_kernel).
    dd = jnp.sum(g.astype(jnp.float32) * o_text.astype(jnp.float32),
                 axis=-1).transpose(0, 2, 1)                   # (B, H, Sq)
    dd = jnp.broadcast_to(_pad_to(dd, sq_pad, 2)[..., None],
                          (b, h, sq_pad, 8))
    lse = _pad_to(lse, sq_pad, 2)[:, :, :sq_pad]

    def prep(x, s_pad):
        return _pad_to(_pad_to(x.transpose(0, 2, 1, 3), s_pad, 2), dh_pad, 3)

    qt, kt = prep(q, sq_pad), prep(k, sk_pad)
    vt, gt = prep(v, sk_pad), prep(g, sq_pad)
    nq, nk = sq_pad // bq, sk_pad // bk
    common = dict(bq=bq, bk=bk, s_k=s_k, s_q=s_q, max_feats=max_feats,
                  scale=scale)

    # pass 1: dq + dgate2, k innermost
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, qi, ki, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((b, h), lambda bi, hi, qi, ki, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dh_pad), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
    )

    def dq_kernel_4d(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, do_ref,
                     lse_ref, dd_ref, dq_ref, dg2_ref, dq_scr, dg2_scr):
        functools.partial(_stream_dq_kernel, **common)(
            vs_ref, g2_ref, q0_ref, q_ref.at[0, 0], k_ref.at[0, 0],
            v_ref.at[0, 0], do_ref.at[0, 0], lse_ref, dd_ref,
            dq_ref.at[0, 0], dg2_ref, dq_scr, dg2_scr)

    dq, dg2 = pl.pallas_call(
        dq_kernel_4d,
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
        ],
        name="flash_stream_dq",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s_q * s_k * dh,
            bytes_accessed=5 * b * h * s_k * dh * 2,
            transcendentals=b * h * s_q * s_k,
        ),
    )(video_start.astype(jnp.int32), gate2.astype(jnp.float32), q0,
      qt, kt, vt, gt, lse, dd)

    # pass 2: dk + dv, q innermost
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, h, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bq, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, 8),
                         lambda bi, hi, ki, qi, *_: (bi, hi, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, dh_pad),
                         lambda bi, hi, ki, qi, *_: (bi, hi, ki, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, dh_pad), jnp.float32),
            pltpu.VMEM((bk, dh_pad), jnp.float32),
        ],
    )

    def dkv_kernel_4d(vs_ref, g2_ref, q0_ref, q_ref, k_ref, v_ref, do_ref,
                      lse_ref, dd_ref, dk_ref, dv_ref, dk_scr, dv_scr):
        functools.partial(_stream_dkv_kernel, **common)(
            vs_ref, g2_ref, q0_ref, q_ref.at[0, 0], k_ref.at[0, 0],
            v_ref.at[0, 0], do_ref.at[0, 0], lse_ref, dd_ref,
            dk_ref.at[0, 0], dv_ref.at[0, 0], dk_scr, dv_scr)

    dk, dv = pl.pallas_call(
        dkv_kernel_4d,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk_pad, dh_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk_pad, dh_pad), q.dtype),
        ],
        name="flash_stream_dkv",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * s_q * s_k * dh,
            bytes_accessed=5 * b * h * s_k * dh * 2,
            transcendentals=b * h * s_q * s_k,
        ),
    )(video_start.astype(jnp.int32), gate2.astype(jnp.float32), q0,
      qt, kt, vt, gt, lse, dd)

    unprep_q = lambda x: x[:, :, :s_q, :dh].transpose(0, 2, 1, 3)
    unprep_k = lambda x: x[:, :, :s_k, :dh].transpose(0, 2, 1, 3)
    return unprep_q(dq), unprep_k(dk), unprep_k(dv), dg2.sum(axis=0)


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
    b, s, h, dh = q.shape
    if s > MAX_SEQ_BWD:
        # streaming regime: the backward needs the text output (for the
        # per-row D) and row log-sum-exps — save both instead of recomputing
        # an extra forward pass inside the backward
        text, lse = flash_streaming_fwd(q, k, v, gate2, video_start,
                                        max_feats)
        out = (text + _adapter_segment(q, adapter_k, adapter_v, gate1)
               ).reshape(b, s, h * dh)
    else:
        out = _flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1,
                                       gate2, video_start, max_feats)
        text = lse = None
    return out, (q, k, v, adapter_k, adapter_v, gate1, gate2, video_start,
                 text, lse)


def _bwd(max_feats, res, g):
    q, k, v, adapter_k, adapter_v, gate1, gate2, video_start, text, lse = res
    b, s, h, dh = q.shape
    g4 = g.reshape(b, s, h, dh)
    if lse is not None:
        # streaming backward from saved (text, lse) — no recompute pass
        dq_t, dk, dv, dg2 = flash_streaming_bwd(
            q, k, v, gate2, video_start, max_feats, g4, o_text=text, lse=lse)
    else:
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


# ---------------------------------------------------------------------------
# Sequence-parallel flash attention (shard_map over the 'sp' mesh axis).
#
# Under sequence parallelism the residual stream (hence q/k/v) is sharded on
# S. The einsum fallback works under GSPMD but still materializes a
# (B, H, S/sp, S) score block per device; this wrapper instead runs the
# STREAMING kernels per shard — local q rows against all-gathered K/V, with
# q_offset giving the kernels global row coordinates — so nothing O(S²)
# ever exists. Collectives: one all-gather of K/V over 'sp' in forward
# (and again in backward), one psum_scatter of the partial dk/dv, one psum
# of the partial dgate2. dq stays local. The adapter-prefix segment and the
# output recombination happen OUTSIDE shard_map as plain GSPMD code (they
# are row-local).
#
# Requires a jax.set_mesh(mesh) context whose mesh has the 'sp' axis
# (core/mesh.py); 'dp'/'tp' are included in the specs when present.
# ---------------------------------------------------------------------------

def _sp_specs(h_dim: int, b_dim: int):
    """(q/k/v spec, gate2 spec, video_start spec, lse spec, axis_names) for
    the ambient mesh — dims whose mesh axis is absent or indivisible stay
    replicated. axis_names lists the axes these shard_maps take MANUAL:
    explicitly {dp, sp, tp} (never pp), so the wrappers also nest inside
    the pipeline's partial-auto pp shard_map (model/pipeline.py) — there
    pp is already manual and must not be re-taken."""
    from jax.sharding import PartitionSpec as P

    from ...core.mesh import DP_AXIS, SP_AXIS, TP_AXIS
    mesh = jax.sharding.get_abstract_mesh()
    names = mesh.axis_names
    if SP_AXIS not in names:
        raise ValueError("sp_flash_adapter_attention needs a mesh with an "
                         f"'{SP_AXIS}' axis in context (jax.set_mesh)")
    dp = DP_AXIS if (DP_AXIS in names
                     and b_dim % mesh.shape[DP_AXIS] == 0) else None
    tp = (TP_AXIS if (TP_AXIS in names
                      and h_dim % mesh.shape[TP_AXIS] == 0) else None)
    from ...core.mesh import manual_axes
    manual = manual_axes(mesh)
    if manual:
        # nested inside another shard_map (the pipeline's pp map): take
        # manual ONLY the axes these wrappers actually use, never the
        # already-bound ones
        axes = (frozenset({SP_AXIS}
                          | {a for a in (DP_AXIS, TP_AXIS) if a in names})
                - manual)
    else:
        # top level: default full-manual (partial-auto shard_map cannot
        # run eagerly — a JAX limitation its error message names out_specs
        # for)
        axes = None
    return (P(dp, SP_AXIS, tp, None), P(tp), P(dp),
            P(dp, tp, SP_AXIS, None), axes)


def _sp_shard_index():
    """A P('sp')-sharded iota whose local slice holds the shard's sp index
    — the nesting-safe replacement for lax.axis_index(SP_AXIS) inside the
    sp shard_maps (axis_index cannot lower when the map is nested inside
    the pipeline's pp shard_map)."""
    from ...core.mesh import SP_AXIS
    mesh = jax.sharding.get_abstract_mesh()
    return jnp.arange(mesh.shape[SP_AXIS], dtype=jnp.int32)


def _sp_text_fwd(q, k, v, gate2, video_start, max_feats):
    """shard_map'd streaming forward → (text (B,S,H,Dh), lse sharded)."""
    from ...core.mesh import SP_AXIS

    qkv_spec, g2_spec, vs_spec, lse_spec, axes = _sp_specs(q.shape[2],
                                                           q.shape[0])
    sp_iota = _sp_shard_index()

    def f(q_loc, k_loc, v_loc, g2, vs, idx):
        # idx: this shard's slice of a P('sp') iota — the sp shard index.
        # (lax.axis_index cannot lower inside a NESTED shard_map — sdy
        # re-binds the parent's manual axes — so the index arrives as data.)
        q0 = idx[0] * q_loc.shape[1]
        kf = jax.lax.all_gather(k_loc, SP_AXIS, axis=1, tiled=True)
        vf = jax.lax.all_gather(v_loc, SP_AXIS, axis=1, tiled=True)
        return flash_streaming_fwd(q_loc, kf, vf, g2, vs, max_feats,
                                   q_offset=q0)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # info, so shard_map's replication checker cannot see through them.
    # axis_names: {dp, sp, tp} explicitly — nests inside the pipeline's
    # pp shard_map (pp stays that outer map's manual axis).
    from jax.sharding import PartitionSpec as P
    kw = {} if axes is None else {"axis_names": axes}
    return jax.shard_map(
        f,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, g2_spec, vs_spec,
                  P(SP_AXIS)),
        out_specs=(qkv_spec, lse_spec), check_vma=False, **kw,
    )(q, k, v, gate2, video_start, sp_iota)


def _sp_text_bwd(q, k, v, gate2, video_start, max_feats, g, text, lse):
    """shard_map'd streaming backward → (dq local, dk/dv scattered back to
    their shards via psum_scatter, dgate2 psummed over dp×sp)."""
    from ...core.mesh import DP_AXIS, SP_AXIS

    qkv_spec, g2_spec, vs_spec, lse_spec, axes = _sp_specs(q.shape[2],
                                                           q.shape[0])
    dg2_axes = ((SP_AXIS, DP_AXIS) if qkv_spec[0] is not None
                else (SP_AXIS,))

    sp_iota = _sp_shard_index()

    def f(q_loc, k_loc, v_loc, g2, vs, g_loc, text_loc, lse_loc, idx):
        q0 = idx[0] * q_loc.shape[1]
        kf = jax.lax.all_gather(k_loc, SP_AXIS, axis=1, tiled=True)
        vf = jax.lax.all_gather(v_loc, SP_AXIS, axis=1, tiled=True)
        dq, dk_full, dv_full, dg2 = flash_streaming_bwd(
            q_loc, kf, vf, g2, vs, max_feats, g_loc,
            o_text=text_loc, lse=lse_loc, q_offset=q0)
        dk = jax.lax.psum_scatter(dk_full, SP_AXIS, scatter_dimension=1,
                                  tiled=True)
        dv = jax.lax.psum_scatter(dv_full, SP_AXIS, scatter_dimension=1,
                                  tiled=True)
        return dq, dk, dv, jax.lax.psum(dg2, dg2_axes)

    from jax.sharding import PartitionSpec as P
    kw = {} if axes is None else {"axis_names": axes}
    return jax.shard_map(
        f,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, g2_spec, vs_spec,
                  qkv_spec, qkv_spec, lse_spec, P(SP_AXIS)),
        out_specs=(qkv_spec, qkv_spec, qkv_spec, g2_spec),
        check_vma=False, **kw,
    )(q, k, v, gate2, video_start, g, text, lse, sp_iota)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def sp_flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1, gate2,
                               video_start, max_feats):
    """Sequence-parallel drop-in for adapter_gated_attention: streaming
    Pallas kernels per S-shard (q_offset-aware), K/V all-gathered over the
    'sp' mesh axis — no O(S²) buffer on any device. Needs jax.set_mesh."""
    b, s, h, dh = q.shape
    text, _ = _sp_text_fwd(q, k, v, gate2, video_start, max_feats)
    out = text + _adapter_segment(q, adapter_k, adapter_v, gate1)
    return out.reshape(b, s, h * dh)


def _sp_fwd(q, k, v, adapter_k, adapter_v, gate1, gate2, video_start,
            max_feats):
    b, s, h, dh = q.shape
    text, lse = _sp_text_fwd(q, k, v, gate2, video_start, max_feats)
    out = (text + _adapter_segment(q, adapter_k, adapter_v, gate1)
           ).reshape(b, s, h * dh)
    return out, (q, k, v, adapter_k, adapter_v, gate1, gate2, video_start,
                 text, lse)


def _sp_bwd(max_feats, res, g):
    q, k, v, adapter_k, adapter_v, gate1, gate2, video_start, text, lse = res
    b, s, h, dh = q.shape
    g4 = g.reshape(b, s, h, dh)
    dq_t, dk, dv, dg2 = _sp_text_bwd(q, k, v, gate2, video_start, max_feats,
                                     g4, text, lse)
    _, avjp = jax.vjp(_adapter_segment, q, adapter_k, adapter_v, gate1)
    dq_a, dak, dav, dg1 = avjp(g4.astype(q.dtype))
    vs_zero = np.zeros(video_start.shape, dtype=jax.dtypes.float0)
    return (dq_t + dq_a, dk, dv, dak, dav, dg1,
            dg2.astype(gate2.dtype), vs_zero)


sp_flash_adapter_attention.defvjp(_sp_fwd, _sp_bwd)


def sp_flash_or_einsum(q, k, v, adapter_k, adapter_v, gate1, gate2,
                       video_start, max_feats):
    """Sequence-parallel dispatch: the shard_map'd streaming kernels on TPU
    (or under the interpreter in tests), the exact einsum formulation — which
    GSPMD partitions directly — everywhere else, and whenever shard_map's
    even-division requirements (S % sp, B % dp) don't hold."""
    from ...core.mesh import DP_AXIS, SP_AXIS

    def _indivisible_reason():
        mesh = jax.sharding.get_abstract_mesh()
        names = mesh.axis_names
        if SP_AXIS not in names:
            return f"no '{SP_AXIS}' axis in mesh {names}"
        if q.shape[1] % mesh.shape[SP_AXIS]:
            return f"S={q.shape[1]} % sp={mesh.shape[SP_AXIS]} != 0"
        if DP_AXIS in names and q.shape[0] % mesh.shape[DP_AXIS]:
            return f"B={q.shape[0]} % dp={mesh.shape[DP_AXIS]} != 0"
        return None

    if not _HAS_PALLAS or (jax.default_backend() != "tpu" and not INTERPRET):
        return adapter_gated_attention(q, k, v, adapter_k, adapter_v, gate1,
                                       gate2, video_start, max_feats)
    reason = _indivisible_reason()
    if reason is not None:
        # Loud, not silent: the einsum path materializes a (B,H,S/sp,S)
        # score block per device — at the long contexts sp exists for,
        # falling back here silently would just OOM later with no clue.
        warnings.warn(
            "sequence-parallel flash kernels skipped (" + reason + "); "
            "using the einsum attention path, which materializes O(S^2/sp) "
            "scores per device. Pick sp/dp that divide S and B evenly.",
            stacklevel=2)
        return adapter_gated_attention(q, k, v, adapter_k, adapter_v, gate1,
                                       gate2, video_start, max_feats)
    return sp_flash_adapter_attention(q, k, v, adapter_k, adapter_v, gate1,
                                      gate2, video_start, max_feats)
