"""Grouped (sub-channel) w8a8 matmul as a Pallas TPU kernel.

The XLA formulation of the grouped int8×int8 matmul (model/int8.py
`_grouped_matmul_impl`) computes per-group partial products as a batched
dot — a (G, M, N) f32 intermediate that XLA materializes in HBM before the
weighted sum. At LLaMA-7B shapes that is multi-GB of pure scale-bookkeeping
traffic per matmul (w1/w3: 32·3072·11008·4 B ≈ 4.3 GB), swamping the int8
MXU win. This kernel keeps the whole per-group reduction in VMEM: the grid
walks (m-block, n-block, k-block) with k innermost, each program quantizes
its activation block per (row, 128-wide group) on the VPU, runs one int8
MXU dot per group, and accumulates scale-corrected f32 into a (bm, bn)
VMEM scratch — nothing bigger than the output tile ever exists.

The reference runs every matmul in fp16 cuBLAS (llama_vqa.py:63-65);
quantization of any kind is an addition over it. Numerics are identical to
`_grouped_matmul_impl` (same per-(token, group) absmax activation scales,
same (K/group, N) weight scales) — asserted in tests/test_quantize.py via
the interpreter, so the XLA path stays the oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU/GPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Set True (tests) to run the kernel through the Pallas interpreter on CPU.
INTERPRET = False

_EPS = 1e-8  # keep in sync with model/int8.py (all-zero padding rows)

# Preferred tile edges; shrunk per-dim to the largest divisor of the padded
# array dim (11008 = 86·128 admits 256 but not 512).
_BM, _BN, _BK = 512, 512, 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick(block: int, dim: int) -> int:
    while dim % block:
        block //= 2
    return block


def _kernel(x_ref, kq_ref, sg_ref, o_ref, acc_scr, *,
            gpb: int, group: int, out_dtype):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    x32 = x_ref[:].astype(jnp.float32)                   # (bm, bk)
    acc = acc_scr[:]
    for g in range(gpb):                                 # static unroll
        xg = x32[:, g * group:(g + 1) * group]
        amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
        xs = jnp.maximum(amax / 127.0, _EPS)             # (bm, 1)
        xq = jnp.round(xg / xs).astype(jnp.int8)
        d = jax.lax.dot_general(
            xq, kq_ref[g * group:(g + 1) * group, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)            # (bm, bn)
        acc = acc + d.astype(jnp.float32) * xs * sg_ref[0, g:g + 1, :]
    acc_scr[:] = acc

    @pl.when(ki == nk - 1)
    def _finalize():
        o_ref[:] = acc_scr[:].astype(out_dtype)


def pallas_supported(x, kq, scale_g) -> bool:
    """Mosaic-alignment guard: callers fall back to the XLA formulation for
    shapes the kernel's tiling can't serve (lane dim must be 128-aligned,
    k-blocks must cover whole groups, groups must fill 128 lanes)."""
    if not _HAS_PALLAS:
        return False
    k_dim, n = kq.shape
    group = k_dim // scale_g.shape[0]
    bk = _pick(_BK, k_dim)
    return n % 128 == 0 and group % 128 == 0 and bk % group == 0


def grouped_matmul_pallas(x, kq, scale_g, interpret: bool | None = None):
    """x (…, K) float; kq (K, N) int8; scale_g (G, N) f32 → (…, N) x.dtype.

    Semantics identical to model/int8.py `_grouped_matmul_impl` (per-(row,
    group) absmax activation quantization folded in)."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n = kq.shape
    g_count = scale_g.shape[0]
    group = k_dim // g_count
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    bm = _pick(_BM, _round_up(max(m, 16), 16))
    bn = _pick(_BN, n)
    bk = _pick(_BK, k_dim)
    if not pallas_supported(x, kq, scale_g):
        from ..int8 import _grouped_matmul_impl
        return _grouped_matmul_impl(x, kq, scale_g)
    gpb = bk // group

    m_pad = _round_up(max(m, 16), bm)
    x2 = x.reshape(m, k_dim)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    # scales regrouped per k-block: (K/bk, gpb, N); the (1, gpb, bn) block's
    # second-minor dim equals the array dim, which Mosaic accepts
    sgb = scale_g.reshape(k_dim // bk, gpb, n)

    kernel = functools.partial(_kernel, gpb=gpb, group=group,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, n // bn, k_dim // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, gpb, bn), lambda mi, ni, ki: (ki, 0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        name="quant_matmul_grouped",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * n,
            bytes_accessed=m * k_dim * 2 + k_dim * n + m * n * 2,
            transcendentals=0,
        ),
    )(x2, kq, sgb)
    return out[:m].reshape(*lead, n)


# ---------------------------------------------------------------------------
# Packed int4 (w4a8) variant: the weight block arrives PACKED (two 4-bit
# values per byte, split-half layout along N — model/int4.py) and is
# unpacked on the VPU inside VMEM. Each program reads ONE packed (bk, bn)
# block and produces TWO output tiles (columns [n0, n0+bn) and
# [N/2+n0, N/2+n0+bn)), so weight HBM traffic is genuinely halved relative
# to the int8 kernel — the XLA formulation (unpack_int4 + dot) would
# materialize the unpacked (K, N) int8 copy in HBM per matmul instead.
# Activation quantization is computed once per (row, group) and reused for
# both halves.
# ---------------------------------------------------------------------------

def _int4_kernel(x_ref, kq4_ref, sg_lo_ref, sg_hi_ref, o_lo_ref, o_hi_ref,
                 acc_lo, acc_hi, *, gpb: int, group: int, out_dtype,
                 act_quant: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_lo[:] = jnp.zeros_like(acc_lo[:])
        acc_hi[:] = jnp.zeros_like(acc_hi[:])

    # unpack once per program: int32 shifts sign-extend each nibble
    p32 = kq4_ref[:].astype(jnp.int32)                   # (bk, bn) packed
    w_lo = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(jnp.int8)
    w_hi = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(jnp.int8)

    a_lo, a_hi = acc_lo[:], acc_hi[:]
    if act_quant:
        x32 = x_ref[:].astype(jnp.float32)               # (bm, bk)
        for g in range(gpb):                             # static unroll
            xg = x32[:, g * group:(g + 1) * group]
            amax = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
            xs = jnp.maximum(amax / 127.0, _EPS)         # (bm, 1)
            xq = jnp.round(xg / xs).astype(jnp.int8)
            dims = (((1,), (0,)), ((), ()))
            d_lo = jax.lax.dot_general(
                xq, w_lo[g * group:(g + 1) * group, :], dims,
                preferred_element_type=jnp.int32)
            d_hi = jax.lax.dot_general(
                xq, w_hi[g * group:(g + 1) * group, :], dims,
                preferred_element_type=jnp.int32)
            a_lo = (a_lo + d_lo.astype(jnp.float32) * xs
                    * sg_lo_ref[0, g:g + 1, :])
            a_hi = (a_hi + d_hi.astype(jnp.float32) * xs
                    * sg_hi_ref[0, g:g + 1, :])
    else:
        # weight-only: bf16 MXU dots on the RAW int values; the per-group
        # scale factors out of the dot — x_g @ (w_g·s_g) == (x_g @ w_g)·s_g
        # per output column — so no per-element dequant buffer ever exists
        xb = x_ref[:].astype(jnp.bfloat16)
        for g in range(gpb):                             # static unroll
            xg = xb[:, g * group:(g + 1) * group]
            dims = (((1,), (0,)), ((), ()))
            d_lo = jax.lax.dot_general(
                xg, w_lo[g * group:(g + 1) * group, :].astype(jnp.bfloat16),
                dims, preferred_element_type=jnp.float32)
            d_hi = jax.lax.dot_general(
                xg, w_hi[g * group:(g + 1) * group, :].astype(jnp.bfloat16),
                dims, preferred_element_type=jnp.float32)
            a_lo = a_lo + d_lo * sg_lo_ref[0, g:g + 1, :]
            a_hi = a_hi + d_hi * sg_hi_ref[0, g:g + 1, :]
    acc_lo[:] = a_lo
    acc_hi[:] = a_hi

    @pl.when(ki == nk - 1)
    def _finalize():
        o_lo_ref[:] = acc_lo[:].astype(out_dtype)
        o_hi_ref[:] = acc_hi[:].astype(out_dtype)


def int4_pallas_supported(x, kq4, scale_g) -> bool:
    """Mosaic-alignment guard for the packed kernel (see pallas_supported).
    FLIPPED_INT4_PALLAS=0 forces the XLA unpack formulation (escape hatch —
    numerics are identical, only weight HBM traffic differs)."""
    import os
    if os.environ.get("FLIPPED_INT4_PALLAS", "1") == "0":
        return False
    if not _HAS_PALLAS:
        return False
    k_dim, n_half = kq4.shape
    group = k_dim // scale_g.shape[0]
    bk = _pick(_BK, k_dim)
    return (n_half % 128 == 0 and group % 128 == 0 and bk % group == 0
            and scale_g.shape[1] == 2 * n_half)


def int4_matmul_grouped_pallas(x, kq4, scale_g, interpret: bool | None = None,
                               act_quant: bool = True):
    """x (…, K) float; kq4 (K, N/2) packed int8 (model/int4.py layout);
    scale_g (G, N) f32 → (…, N) x.dtype.

    act_quant=True: semantics identical to model/int8.py
    `_grouped_matmul_impl` applied to the unpacked weights (asserted in
    tests/test_quant_matmul_pallas.py via the interpreter).
    act_quant=False: weight-only — bf16 MXU dots on the raw 4-bit values
    with per-group scales applied to the partial products (within bf16
    accumulation-order noise of x @ dequant(W))."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n_half = kq4.shape
    g_count = scale_g.shape[0]
    group = k_dim // g_count
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    bm = _pick(_BM, _round_up(max(m, 16), 16))
    bn = _pick(_BN, n_half)
    bk = _pick(_BK, k_dim)
    if not int4_pallas_supported(x, kq4, scale_g):
        from ..int4 import unpack_int4
        from ..int8 import _grouped_matmul_impl
        return _grouped_matmul_impl(x, unpack_int4(kq4), scale_g)
    gpb = bk // group
    nh_blocks = n_half // bn

    m_pad = _round_up(max(m, 16), bm)
    x2 = x.reshape(m, k_dim)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    # scales regrouped per k-block: (K/bk, gpb, N); the lo/hi halves are
    # separate in_specs over the SAME array with shifted n index maps
    sgb = scale_g.reshape(k_dim // bk, gpb, 2 * n_half)

    kernel = functools.partial(_int4_kernel, gpb=gpb, group=group,
                               out_dtype=x.dtype, act_quant=act_quant)
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, nh_blocks, k_dim // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((bk, bn), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((1, gpb, bn), lambda mi, ni, ki: (ki, 0, ni)),
            pl.BlockSpec((1, gpb, bn),
                         lambda mi, ni, ki: (ki, 0, ni + nh_blocks)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
            pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m_pad, n_half), x.dtype),
                   jax.ShapeDtypeStruct((m_pad, n_half), x.dtype)],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.float32)],
        name="int4_matmul",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * 2 * n_half,
            bytes_accessed=m * k_dim * 2 + k_dim * n_half + m * n_half * 4,
            transcendentals=0,
        ),
    )(x2, kq4, sgb, sgb)
    out = jnp.concatenate([out_lo[:m], out_hi[:m]], axis=-1)
    return out.reshape(*lead, 2 * n_half)


# ---------------------------------------------------------------------------
# Backward (dx) kernels: dx = g @ dequant(W)ᵀ with the dequant done per
# (group, bn) block in VMEM. The XLA backward (model/int8.py _g_bwd /
# model/int4.py _int4_bwd) materializes the full dequantized bf16 (K, N)
# kernel in HBM before the dot — an extra write+read of 2·K·N bytes per
# matmul per step that these kernels remove (the quantized weights are read
# once, at their stored width). Elementwise numerics match the XLA
# backward exactly ((kq·s)→bf16 rounding, f32-accumulated bf16 dots); only
# the f32 sum order over n-blocks differs.
# ---------------------------------------------------------------------------

def _dx_kernel(g_ref, kq_ref, sg_ref, o_ref, acc_scr, *,
               gpb: int, group: int, out_dtype):
    ni = pl.program_id(2)
    nn = pl.num_programs(2)

    @pl.when(ni == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    gb = g_ref[:].astype(jnp.bfloat16)                   # (bm, bn)
    parts = []
    for gi in range(gpb):                                # static unroll
        # same elementwise rounding as _g_bwd: bf16(kq)·bf16(s)
        w_g = (kq_ref[gi * group:(gi + 1) * group, :].astype(jnp.bfloat16)
               * sg_ref[0, gi, :].astype(jnp.bfloat16))  # (group, bn)
        parts.append(jax.lax.dot_general(
            gb, w_g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))         # (bm, group)
    # the unrolled groups tile the whole (bm, bk) block contiguously, so one
    # concat + add covers the k axis — a sliced .at[].add would lower to
    # scatter-add, which Mosaic cannot lower on TPU
    acc_scr[:] = acc_scr[:] + jnp.concatenate(parts, axis=1)

    @pl.when(ni == nn - 1)
    def _finalize():
        # the XLA backward's bf16@bf16 dot emits a bf16 RESULT before the
        # g.dtype cast — round identically for drop-in numerics
        o_ref[:] = acc_scr[:].astype(jnp.bfloat16).astype(out_dtype)


def dx_pallas_supported(g, kq, scale_g) -> bool:
    """Alignment guard for the dx kernel (mirrors pallas_supported: the
    contraction dim N must tile 128 lanes, k-blocks must cover whole
    groups)."""
    if not _HAS_PALLAS:
        return False
    k_dim, n = kq.shape
    if k_dim % scale_g.shape[0]:
        return False
    group = k_dim // scale_g.shape[0]
    bk = _pick(_BK, k_dim)
    return n % 128 == 0 and group % 128 == 0 and bk % group == 0


def quant_dx_pallas(g, kq, scale_g, interpret: bool | None = None):
    """g (…, N) float; kq (K, N) int8; scale_g (G, N) f32 → dx (…, K)
    g.dtype. Per-channel scales are the G=1-per-128-rows broadcast case
    (model/int8.py wires it)."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n = kq.shape
    g_count = scale_g.shape[0]
    group = k_dim // g_count
    lead = g.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    bm = _pick(_BM, _round_up(max(m, 16), 16))
    bn = _pick(_BN, n)
    bk = _pick(_BK, k_dim)
    if not dx_pallas_supported(g, kq, scale_g):
        raise ValueError("quant_dx_pallas on unsupported shapes — callers "
                         "must check dx_pallas_supported first")
    gpb = bk // group

    m_pad = _round_up(max(m, 16), bm)
    g2 = g.reshape(m, n)
    if m_pad != m:
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))
    sgb = scale_g.reshape(k_dim // bk, gpb, n)

    kernel = functools.partial(_dx_kernel, gpb=gpb, group=group,
                               out_dtype=g.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, k_dim // bk, n // bn),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ki, ni: (mi, ni)),
            pl.BlockSpec((bk, bn), lambda mi, ki, ni: (ki, ni)),
            pl.BlockSpec((1, gpb, bn), lambda mi, ki, ni: (ki, 0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda mi, ki, ni: (mi, ki)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_dim), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        name="quant_dx_grouped",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * n,
            bytes_accessed=m * n * 2 + k_dim * n + m * k_dim * 2,
            transcendentals=0,
        ),
    )(g2, kq, sgb)
    return out[:m].reshape(*lead, k_dim)


def _int4_dx_kernel(g_lo_ref, g_hi_ref, kq4_ref, sg_lo_ref, sg_hi_ref,
                    o_ref, acc_scr, *, gpb: int, group: int, out_dtype):
    ni = pl.program_id(2)
    nn = pl.num_programs(2)

    @pl.when(ni == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    p32 = kq4_ref[:].astype(jnp.int32)                   # (bk, bn) packed
    w_lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    w_hi = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    gb_lo = g_lo_ref[:].astype(jnp.bfloat16)             # (bm, bn)
    gb_hi = g_hi_ref[:].astype(jnp.bfloat16)
    parts = []
    for gi in range(gpb):                                # static unroll
        sl = slice(gi * group, (gi + 1) * group)
        # same elementwise rounding as _dequant_bf16: bf16(w)·bf16(s)
        wd_lo = (w_lo[sl, :].astype(jnp.bfloat16)
                 * sg_lo_ref[0, gi, :].astype(jnp.bfloat16))
        wd_hi = (w_hi[sl, :].astype(jnp.bfloat16)
                 * sg_hi_ref[0, gi, :].astype(jnp.bfloat16))
        dims = (((1,), (1,)), ((), ()))
        d = jax.lax.dot_general(gb_lo, wd_lo, dims,
                                preferred_element_type=jnp.float32)
        parts.append(d + jax.lax.dot_general(
            gb_hi, wd_hi, dims, preferred_element_type=jnp.float32))
    # contiguous static unroll over the k axis: concat + add, no scatter
    # (Mosaic cannot lower the sliced .at[].add form on TPU)
    acc_scr[:] = acc_scr[:] + jnp.concatenate(parts, axis=1)

    @pl.when(ni == nn - 1)
    def _finalize():
        # match the XLA backward's bf16 dot-result rounding (see _dx_kernel)
        o_ref[:] = acc_scr[:].astype(jnp.bfloat16).astype(out_dtype)


def int4_dx_pallas(g, kq4, scale_g, interpret: bool | None = None):
    """g (…, N) float; kq4 (K, N/2) packed int8; scale_g (G, N) f32 →
    dx (…, K) g.dtype. Reads the PACKED weights once — the XLA backward
    unpacks to (K, N) int8 and dequantizes to (K, N) bf16 in HBM first."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n_half = kq4.shape
    g_count = scale_g.shape[0]
    group = k_dim // g_count
    lead = g.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    bm = _pick(_BM, _round_up(max(m, 16), 16))
    bn = _pick(_BN, n_half)
    bk = _pick(_BK, k_dim)
    if not int4_pallas_supported(g, kq4, scale_g):
        raise ValueError("int4_dx_pallas on unsupported shapes — callers "
                         "must check int4_pallas_supported first")
    gpb = bk // group
    nh_blocks = n_half // bn

    m_pad = _round_up(max(m, 16), bm)
    g2 = g.reshape(m, 2 * n_half)
    if m_pad != m:
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))
    sgb = scale_g.reshape(k_dim // bk, gpb, 2 * n_half)

    kernel = functools.partial(_int4_dx_kernel, gpb=gpb, group=group,
                               out_dtype=g.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, k_dim // bk, nh_blocks),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda mi, ki, ni: (mi, ni)),
            pl.BlockSpec((bm, bn), lambda mi, ki, ni: (mi, ni + nh_blocks)),
            pl.BlockSpec((bk, bn), lambda mi, ki, ni: (ki, ni)),
            pl.BlockSpec((1, gpb, bn), lambda mi, ki, ni: (ki, 0, ni)),
            pl.BlockSpec((1, gpb, bn),
                         lambda mi, ki, ni: (ki, 0, ni + nh_blocks)),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda mi, ki, ni: (mi, ki)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_dim), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        name="int4_dx",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * 2 * n_half,
            bytes_accessed=m * n_half * 4 + k_dim * n_half + m * k_dim * 2,
            transcendentals=0,
        ),
    )(g2, g2, kq4, sgb, sgb)
    return out[:m].reshape(*lead, k_dim)
