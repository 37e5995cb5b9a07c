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


# ---------------------------------------------------------------------------
# Fused w8a8d dgrad kernel: the quantized-backward dx in ONE pass over the
# cotangent. The XLA formulation (model/int8.py _dgrad_dx_xla) leaves the
# cotangent quantize UNFUSED machinery around the int8 dot — measured at the
# 7B bench shape (docs/PERF.md w8a8d trace table) the per-row absmax is a
# standalone 48 ms reduce bucket (it reads every cotangent element before
# the dot can start) and the SR-dither chain adds ~25 ms of copies. This
# kernel streams each (bm, N) cotangent row-block into VMEM once: scale-fold
# → row absmax → hash-dithered stochastic-round quantize into an int8 VMEM
# scratch (at k-block 0), then every k-block runs one int8×int8 MXU dot
# against the stored weights — the quantized cotangent never exists in HBM
# and the cotangent is read exactly once.
#
# Numerics: bit-for-bit vs the XLA formulation under the Pallas INTERPRETER
# (asserted in tests/test_quant_matmul_pallas.py): the murmur-mixed dither
# hash of model/int8.py stochastic_round is reproduced with its GLOBAL iota
# coordinates (col = lane index; row = flattened row % S, matching XLA's
# dim(-2) iota on the (B, S, N) cotangent), the f32 elementwise chain is
# written op-for-op the same, and the full-N contraction is a single int32
# dot per (m, k) tile in both formulations. On real TPU, Mosaic's f32
# divide/round may differ from XLA:TPU in the last ulp, which can flip
# individual dither draws — the result is still valid unbiased SR with the
# same scales, just not guaranteed bit-identical on hardware.
# ---------------------------------------------------------------------------

# Full-N row blocks: bound the f32 quantize temp by processing N in
# ≤_DGRAD_CHUNK-lane chunks (N=11008 → two 5504 chunks at 2.8 MB f32 each).
_DGRAD_BM, _DGRAD_BK, _DGRAD_CHUNK = 128, 256, 5632


def _dgrad_chunks(n: int) -> int:
    """Smallest chunk count whose 128-aligned chunks cover n."""
    c = 1
    while n // c > _DGRAD_CHUNK or n % (c * 128):
        c += 1
        if c > n // 128:
            return n // 128
    return c


def _dgrad_kernel(g_ref, kq_ref, s_ref, o_ref, gq_scr, gsc_scr, *,
                  bm: int, s_mod: int, n_chunks: int, out_dtype):
    mi = pl.program_id(0)   # NOT inside pl.when closures (Mosaic constraint)
    ki = pl.program_id(1)
    n = g_ref.shape[1]
    cn = n // n_chunks

    @pl.when(ki == 0)
    def _quantize():
        # dither row coordinate: XLA's broadcasted_iota over dim(-2) of the
        # (B, S, N) cotangent == flattened row % S
        rows = (jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
                + mi * bm) % s_mod
        row_u = rows.astype(jnp.uint32) * np.uint32(0x85EBCA6B)

        amax = None
        for c in range(n_chunks):                        # static unroll
            gs = (g_ref[:, c * cn:(c + 1) * cn].astype(jnp.float32)
                  * s_ref[0:1, c * cn:(c + 1) * cn])
            a = jnp.max(jnp.abs(gs), axis=-1, keepdims=True)
            amax = a if amax is None else jnp.maximum(amax, a)
        # reciprocal multiply, bit-matching _dgrad_dx_xla (see the
        # note there: jit rewrites div-by-constant to this anyway)
        gsc = jnp.maximum(amax * np.float32(1.0 / 127.0), _EPS)

        parts = []
        for c in range(n_chunks):                        # static unroll
            gs = (g_ref[:, c * cn:(c + 1) * cn].astype(jnp.float32)
                  * s_ref[0:1, c * cn:(c + 1) * cn])
            x = gs / gsc
            fl = jnp.floor(x)
            frac = x - fl
            h = jax.lax.bitcast_convert_type(x, jnp.uint32)
            col = (jax.lax.broadcasted_iota(jnp.uint32, x.shape, 1)
                   + np.uint32(c * cn))
            h = h ^ (col * np.uint32(0x9E3779B9))
            h = h ^ row_u
            h = (h ^ (h >> 16)) * np.uint32(0x7FEB352D)
            h = (h ^ (h >> 15)) * np.uint32(0x846CA68B)
            h = h ^ (h >> 16)
            # Mosaic has no uint32→f32 cast; split into two exact ≤2^16
            # int32→f32 converts — hi·2^16 is a power-of-two scaling and the
            # single f32 add rounds to nearest-even, i.e. bit-identical to
            # XLA's direct correctly-rounded uint32→f32 conversion
            hf = ((h >> 16).astype(jnp.int32).astype(jnp.float32)
                  * np.float32(65536.0)
                  + (h & np.uint32(0xFFFF)).astype(jnp.int32)
                  .astype(jnp.float32))
            u = hf * np.float32(2.0 ** -32)
            parts.append((fl + (frac > u).astype(jnp.float32))
                         .astype(jnp.int8))
        gq_scr[:] = parts[0] if n_chunks == 1 else jnp.concatenate(parts, 1)
        gsc_scr[:] = jnp.broadcast_to(gsc, gsc_scr.shape)

    d = jax.lax.dot_general(gq_scr[:], kq_ref[:], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (bm, bk)
    o_ref[:] = (d.astype(jnp.float32) * gsc_scr[:, 0:1]).astype(out_dtype)


def dgrad_pallas_supported(g, kq) -> bool:
    """Alignment + VMEM guard for the fused dgrad kernel. OPT-IN via
    FLIPPED_DGRAD_PALLAS=1 (read at trace time like the other gates):
    measured on v5e the fused kernel LOSES to the unfused XLA formulation
    both per-matmul (1.26 vs 1.10 ms @4096×4096, 4.04 vs 1.73 @4096×11008,
    2.44 vs 1.81 @11008×4096 — scripts/dx_formulation_probe.py --phase dx)
    and end-to-end (w8a8d 7B step 0.557 s fused vs 0.428 s XLA): the
    full-N row-block layout it needs for the in-VMEM quantize forces
    narrow (bm, bk) output tiles whose grid overhead exceeds what fusing
    the absmax/SR machinery saves — so the XLA formulation is the
    default, same verdict as the per-channel dx and fused-forward
    kernels."""
    import os
    if os.environ.get("FLIPPED_DGRAD_PALLAS", "0") != "1":
        return False
    if not _HAS_PALLAS:
        return False
    k_dim, n = kq.shape
    if g.ndim < 2 or g.shape[-1] != n:
        return False
    return (n % 128 == 0 and k_dim % 128 == 0 and n <= 32768
            and n % (_dgrad_chunks(n) * 128) == 0)


def int8_dgrad_pallas(g, kq, scale, interpret: bool | None = None):
    """g (…, N) float; kq (K, N) int8; scale (N,) f32 → dx (…, K) g.dtype.

    Fused w8a8d backward: dx[m,k] = Σ_n SR((g·s)/gsc)[m,n] · kq[k,n] · gsc[m]
    with the scale-folded cotangent stochastically rounded to int8 per row —
    bit-exact vs model/int8.py _dgrad_dx_xla under the interpreter (on
    hardware, Mosaic last-ulp divide/round differences may flip individual
    SR dither draws; see the module comment above)."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n = kq.shape
    lead = g.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    s_mod = g.shape[-2] if g.ndim >= 2 else max(m, 1)

    # wide contractions (7B ffn N=11008) halve the row block and the weight
    # block: the quantize's live f32 hash temps are (bm, n/chunks) and the
    # measured Mosaic scoped-vmem stack at bm=128/bk=256 is 22 MB vs the
    # 16 MB limit — bm=64/bk=128 fits with headroom
    wide = n > 8192
    bm = _pick(_DGRAD_BM // (2 if wide else 1), _round_up(max(m, 32), 32))
    bk = _pick(_DGRAD_BK // (2 if wide else 1), k_dim)
    n_chunks = _dgrad_chunks(n)

    m_pad = _round_up(max(m, 32), bm)
    g2 = g.reshape(m, n)
    if m_pad != m:
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))

    kernel = functools.partial(_dgrad_kernel, bm=bm, s_mod=s_mod,
                               n_chunks=n_chunks, out_dtype=g.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, k_dim // bk),
        in_specs=[
            pl.BlockSpec((bm, n), lambda mi, ki: (mi, 0)),
            pl.BlockSpec((bk, n), lambda mi, ki: (ki, 0)),
            pl.BlockSpec((1, n), lambda mi, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda mi, ki: (mi, ki)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_dim), g.dtype),
        scratch_shapes=[pltpu.VMEM((bm, n), jnp.int8),
                        pltpu.VMEM((bm, 128), jnp.float32)],
        name="int8_dgrad",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * n,
            bytes_accessed=m * n * 2 + k_dim * n + m * k_dim * 2,
            transcendentals=0,
        ),
    )(g2, kq, scale.reshape(1, n))
    return out[:m].reshape(*lead, k_dim)


# ---------------------------------------------------------------------------
# Fused per-channel w8a8 FORWARD kernel: same single-pass structure as the
# dgrad kernel, on the forward dot. The XLA formulation (model/int8.py
# _int8_matmul_fwd_impl) leaves the per-row activation absmax + RTN
# quantize as separate machinery around the int8 dot; this kernel streams
# each (bm, K) activation row-block into VMEM once — absmax, RTN-quantize
# into an int8 scratch at n-block 0 — then every n-block runs one int8×int8
# MXU dot. Bit-exact vs _int8_matmul_fwd_impl under the interpreter (RTN
# has no dither; the reciprocal-multiply scale matches the jitted XLA graph
# — see the note in model/int8.py _quantize_act). On hardware, Mosaic
# last-ulp divide/round differences can shift an activation value sitting
# exactly on an RTN boundary by one int8 code — same per-channel scale
# envelope either way.
# ---------------------------------------------------------------------------

_FWD_BM, _FWD_BN = 128, 256


def _fwd_kernel(x_ref, kq_ref, s_ref, o_ref, xq_scr, xs_scr, *,
                n_chunks: int, out_dtype):
    ni = pl.program_id(1)   # NOT inside pl.when closures (Mosaic constraint)
    k = x_ref.shape[1]
    ck = k // n_chunks

    @pl.when(ni == 0)
    def _quantize():
        amax = None
        for c in range(n_chunks):                        # static unroll
            xc = jnp.abs(x_ref[:, c * ck:(c + 1) * ck].astype(jnp.float32))
            a = jnp.max(xc, axis=-1, keepdims=True)
            amax = a if amax is None else jnp.maximum(amax, a)
        xs = jnp.maximum(amax * np.float32(1.0 / 127.0), _EPS)  # (bm, 1)
        parts = []
        for c in range(n_chunks):                        # static unroll
            xc = x_ref[:, c * ck:(c + 1) * ck].astype(jnp.float32)
            parts.append(jnp.round(xc / xs).astype(jnp.int8))
        xq_scr[:] = parts[0] if n_chunks == 1 else jnp.concatenate(parts, 1)
        xs_scr[:] = jnp.broadcast_to(xs, xs_scr.shape)

    d = jax.lax.dot_general(xq_scr[:], kq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (bm, bn)
    o_ref[:] = (d.astype(jnp.float32) * xs_scr[:, 0:1]
                * s_ref[0:1, :]).astype(out_dtype)


def fwd_pallas_supported(x, kq) -> bool:
    """Alignment + VMEM guard for the fused forward kernel (mirrors
    dgrad_pallas_supported). OPT-IN via FLIPPED_FWD_PALLAS=1 (read at
    trace time like the other gates): measured on v5e at the 7B bench
    shapes the fused kernel LOSES to the XLA formulation at every matmul
    (1.34 vs 1.10 ms @4096×4096, 2.37 vs 1.85 @4096×11008, 3.78 vs 1.62
    @11008×4096 — scripts/dx_formulation_probe.py --phase fwd) — XLA
    already keeps the quantize fused tightly enough that the kernel's
    single-pass HBM saving cannot pay for its grid overhead, so the XLA
    path is the default."""
    import os
    if os.environ.get("FLIPPED_FWD_PALLAS", "0") != "1":
        return False
    if not _HAS_PALLAS:
        return False
    k_dim, n = kq.shape
    if x.ndim < 2 or x.shape[-1] != k_dim:
        return False
    return (n % 128 == 0 and k_dim % 128 == 0 and k_dim <= 32768
            and k_dim % (_dgrad_chunks(k_dim) * 128) == 0)


def int8_fwd_pallas(x, kq, scale, interpret: bool | None = None):
    """x (…, K) float; kq (K, N) int8; scale (N,) f32 → (…, N) x.dtype.

    Fused per-channel w8a8 forward: per-row absmax RTN activation quantize
    in VMEM + int8 MXU dot — bit-exact vs model/int8.py
    _int8_matmul_fwd_impl under the interpreter (hardware caveat: see the
    module comment above int8_dgrad_pallas)."""
    interpret = INTERPRET if interpret is None else interpret
    k_dim, n = kq.shape
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    # wide activations (7B w2 K=11008): same scoped-vmem pressure as the
    # dgrad kernel — halve the row and weight-column blocks
    wide = k_dim > 8192
    bm = _pick(_FWD_BM // (2 if wide else 1), _round_up(max(m, 32), 32))
    bn = _pick(_FWD_BN // (2 if wide else 1), n)
    n_chunks = _dgrad_chunks(k_dim)

    m_pad = _round_up(max(m, 32), bm)
    x2 = x.reshape(m, k_dim)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    kernel = functools.partial(_fwd_kernel, n_chunks=n_chunks,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k_dim), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k_dim, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k_dim), jnp.int8),
                        pltpu.VMEM((bm, 128), jnp.float32)],
        name="int8_fwd",
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k_dim * n,
            bytes_accessed=m * k_dim * 2 + k_dim * n + m * n * 2,
            transcendentals=0,
        ),
    )(x2, kq, scale.reshape(1, n))
    return out[:m].reshape(*lead, n)


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
