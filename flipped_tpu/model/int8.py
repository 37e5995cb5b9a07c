"""w8a8 matmul: int8 activations × int8 weights on the MXU.

The v5e MXU executes int8×int8→int32 dots at 2× its bf16 FLOP rate
(394 vs 197 TOPS), so quantizing *activations* on the fly — per-token
symmetric absmax, the standard w8a8 recipe — roughly halves the matmul time
of the frozen backbone beyond what weight-only int8 (HBM relief only) gives.

This is an addition over the reference, which runs every matmul in fp16
cuBLAS (llama_vqa.py:63-65). Opt-in via --quantize w8a8.

Backward is exact w.r.t. the *dequantized* weights: a custom VJP returns
dx = g @ (kq·scale)ᵀ in bf16 (straight-through the activation rounding) —
the same dequantized-weight gradients as the weight-only int8 path, up to
one bf16 ulp of f32 sum order when the Pallas dx kernel carries it
(pallas/quant_matmul.py). The frozen backbone has no weight grads, so
this is the only cotangent needed.

The LM head stays weight-only (callers choose): logit perturbation feeds
the eval argmin (reference: engine.py:87-93) directly, while hidden-layer
perturbation is damped by the residual stream — see
scripts/int8_parity_study.py --phase w8a8 for the measured envelope.

Env flags (all read at TRACE time: set before the first jit compilation;
toggling after compile has no effect on cached executables)
---------
FLIPPED_DX_PALLAS_PER_CHANNEL=1 routes the PER-CHANNEL int8 backward's dx
through the Pallas grouped-dequant kernel (broadcast 128-wide scale groups)
instead of the default XLA dequant + full-width dot. Measured SLOWER on
v5e at the 7B bench shape (0.545 vs 0.451 s/step) — kept as an escape
hatch for shapes where the dequantized (K, N) HBM buffer becomes the
binding constraint.
FLIPPED_DGRAD_PALLAS=1 opts the w8a8d backward's cotangent quantize +
int8 dot INTO the fused Pallas kernel (interpret-mode bit-identical; on
hardware Mosaic last-ulp rounding can flip individual SR dither draws —
see pallas/quant_matmul.py). Measured SLOWER on v5e both per-matmul and
end-to-end (w8a8d 7B step 0.557 s fused vs 0.428 s XLA — numbers in
dgrad_pallas_supported), so the unfused XLA formulation is the default.
FLIPPED_FWD_PALLAS=1 opts the per-channel w8a8 forward INTO the fused
Pallas kernel (int8_fwd_pallas, reachable via _fwd_dispatch on every
int8/w8a8 forward). Measured SLOWER on v5e at every 7B bench matmul
shape (scripts/dx_formulation_probe.py --phase fwd, numbers in
fwd_pallas_supported) — the XLA formulation is the default.
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

# Per-token scale floor: all-zero rows (padding) divide safely.
_EPS = 1e-8


def _quantize_act(x: jax.Array):
    """(… , K) float → int8 with per-row absmax scales (…, 1) f32.

    The scale is an explicit reciprocal multiply, not amax/127.0: under jit
    XLA rewrites division-by-constant into exactly this multiply, so the
    jitted numerics are unchanged — but pinning the op keeps the fused
    Pallas forward kernel (pallas/quant_matmul.int8_fwd_pallas) bit-exact
    against this formulation on every lowering path."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax * np.float32(1.0 / 127.0), _EPS)
    xq = jnp.round(x32 / xs).astype(jnp.int8)  # |x| ≤ amax ⇒ no clip needed
    return xq, xs


def _int8_matmul_fwd_impl(x, kq, scale):
    xq, xs = _quantize_act(x)
    out = jax.lax.dot_general(
        xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * xs * scale[None, :]).astype(x.dtype)


def _fwd_dispatch(x, kq, scale):
    """Mesh/platform-aware per-channel w8a8 forward (mirrors _dx_dispatch).
    The fused kernel is OPT-IN (FLIPPED_FWD_PALLAS=1, measured slower than
    XLA on v5e — numbers in fwd_pallas_supported); with the flag unset this
    is exactly _int8_matmul_fwd_impl. GSPMD-partitioned layouts and
    unsupported shapes always take the XLA formulation. Interpret-mode
    bit-identical numerics (RTN, reciprocal-multiply scales — see
    _quantize_act)."""
    from .pallas.quant_matmul import fwd_pallas_supported, int8_fwd_pallas
    if not fwd_pallas_supported(x, kq):
        return _int8_matmul_fwd_impl(x, kq, scale)
    return pallas_mesh_dispatch(int8_fwd_pallas, _int8_matmul_fwd_impl,
                                _int8_matmul_fwd_impl, x, kq, scale)


@jax.custom_vjp
def int8_matmul(x, kq, scale):
    """x (…, K) float; kq (K, N) int8; scale (N,) f32 → (…, N) x.dtype."""
    return _fwd_dispatch(x, kq, scale)


def _fwd(x, kq, scale):
    # the output (hence g) carries x's dtype, so no dtype residual is needed
    return _fwd_dispatch(x, kq, scale), (kq, scale)


def _bwd(res, g):
    kq, scale = res
    k_dim = kq.shape[0]
    if (k_dim % 128 == 0
            and os.environ.get("FLIPPED_DX_PALLAS_PER_CHANNEL", "0") == "1"):
        # per-channel scales as degenerate 128-wide groups (identical value
        # per group) routed through the block-dequant dx kernel. MEASURED
        # SLOWER on v5e at the 7B bench shape (0.545 vs 0.451 s/step): for
        # per-channel scales XLA's dequant + one full-width dot beats the
        # kernel's group-sliced dots, so the XLA path below is the default —
        # the Pallas dx kernels stay the default only for the grouped
        # (sub-channel) and packed-int4 paths (_g_bwd / _int4_bwd), whose
        # XLA backwards must materialize real per-group dequant buffers.
        sg = jnp.broadcast_to(scale[None, :], (k_dim // 128, scale.shape[0]))
        dx = _dx_dispatch(g, kq, sg)
    else:
        w = kq.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)[None, :]
        dx = (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)
    zero = np.zeros((), jax.dtypes.float0)
    return (dx,
            np.broadcast_to(zero, kq.shape),
            jnp.zeros_like(scale))


int8_matmul.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# w8a8d: additionally run the BACKWARD dx dot on the int8 MXU rate.
# dx[m,k] = Σ_n g[m,n]·s[n]·kq[k,n]: fold the weight scale into the
# cotangent, per-row absmax-quantize it, and contract int8×int8. Measured
# per-matmul on v5e at the 7B bench shapes (scripts/dx_formulation_probe.py):
# 22-30% faster than the exact bf16 dx. NOT exact — adds activation-grad
# rounding on top of w8a8's forward rounding. The cotangent is quantized
# with STOCHASTIC rounding, not round-to-nearest: a gradient row is spiky
# (one large entry sets the absmax scale), so RTN systematically zeroes the
# many small entries and the lost descent directions compound — measured at
# 7B over 128 optimizer steps the RTN trajectory UNDER-TRAINS (loss drop
# 11.00 vs bf16's 11.94; 6.3% mean relative loss delta where plain w8a8
# deviates 0.11%). SR keeps each quantized entry an unbiased estimator so
# small entries survive in expectation: the SR run recovers the full loss
# drop (12.25, final loss at/below the bf16 control) at the cost of noise
# (grad norms +65%, per-step loss path deviates ~4.5%) and ~6% step time
# vs RTN (0.428 vs 0.404 s at the 7B bench shape; w8a8 exact dx: 0.451 s).
# NOT a parity mode — evidence in scripts/int8_parity_study.py --phase
# w8a8d --mode train and docs/PERF.md. Opt-in via --quantize w8a8d|w8a8rd.
# ---------------------------------------------------------------------------

def stochastic_round(x):
    """Round x up with probability frac(x) — unbiased: E[result] = x.

    The dither is a murmur-mixed hash of the value's own float32 bits and
    its (row, col) position, not a threaded PRNG key: a custom_vjp backward
    has nowhere to receive one, and step-to-step decorrelation comes from
    the gradient values themselves changing every step. Two rounds of
    multiply-xor-shift mixing decorrelate the dither from frac(x) (whose
    information lives in the same bits) — unbiasedness is asserted
    statistically in tests/test_quantize.py."""
    x = x.astype(jnp.float32)
    fl = jnp.floor(x)
    frac = x - fl
    h = jax.lax.bitcast_convert_type(x, jnp.uint32)
    h = h ^ (jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 1)
             * np.uint32(0x9E3779B9))
    if x.ndim >= 2:
        h = h ^ (jax.lax.broadcasted_iota(jnp.uint32, x.shape, x.ndim - 2)
                 * np.uint32(0x85EBCA6B))
    h = (h ^ (h >> 16)) * np.uint32(0x7FEB352D)
    h = (h ^ (h >> 15)) * np.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    u = h.astype(jnp.float32) * np.float32(2.0 ** -32)
    return fl + (frac > u).astype(jnp.float32)


@jax.custom_vjp
def int8_matmul_dgrad(x, kq, scale):
    """int8_matmul with an int8-quantized activation-gradient backward."""
    return _int8_matmul_fwd_impl(x, kq, scale)


def _dgrad_dx_xla(g, kq, scale):
    """The XLA formulation of the w8a8d dx (the DEFAULT): scale-fold →
    per-row absmax → SR-quantize → int8 dot. The quantize is unfused
    machinery around the dot (at the 7B bench shape: a 48 ms standalone
    absmax reduce + ~25 ms of dither-chain copies per step, docs/PERF.md)
    — but the fused Pallas kernel built to remove it
    (pallas/quant_matmul.int8_dgrad_pallas, interpret-mode bit-exact with
    this function) measured SLOWER on the chip (0.557 vs 0.428 s/step:
    its full-N row blocks force narrow output tiles), so this remains the
    production path and the kernel is the FLIPPED_DGRAD_PALLAS=1 escape
    hatch."""
    gs = g.astype(jnp.float32) * scale[None, :]
    amax = jnp.max(jnp.abs(gs), axis=-1, keepdims=True)
    # explicit reciprocal multiply, NOT amax/127.0: under jit XLA rewrites
    # division-by-constant into this multiply anyway (different last-ulp
    # rounding than the eager IEEE divide), and the fused Pallas kernel must
    # produce bit-identical scales for the SR dither to match — pin the op
    # so every lowering computes the same thing
    gsc = jnp.maximum(amax * np.float32(1.0 / 127.0), _EPS)
    gq = stochastic_round(gs / gsc).astype(jnp.int8)
    out = jax.lax.dot_general(
        gq, kq, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * gsc).astype(g.dtype)


def _dgrad_dispatch(g, kq, scale):
    """Mesh/platform-aware dgrad dx (mirrors _dx_dispatch). The fused
    kernel is OPT-IN (FLIPPED_DGRAD_PALLAS=1 — measured slower than the
    unfused XLA formulation on v5e, numbers in dgrad_pallas_supported);
    with the flag unset this is exactly _dgrad_dx_xla. GSPMD-partitioned
    layouts and unsupported shapes always take the XLA formulation.
    Interpret-mode bit-identical SR dither either way."""
    from .pallas.quant_matmul import dgrad_pallas_supported, int8_dgrad_pallas
    if not dgrad_pallas_supported(g, kq):
        return _dgrad_dx_xla(g, kq, scale)
    return pallas_mesh_dispatch(int8_dgrad_pallas, _dgrad_dx_xla,
                                _dgrad_dx_xla, g, kq, scale)


def _bwd_dgrad(res, g):
    kq, scale = res
    dx = _dgrad_dispatch(g, kq, scale)
    zero = np.zeros((), jax.dtypes.float0)
    return (dx,
            np.broadcast_to(zero, kq.shape),
            jnp.zeros_like(scale))


int8_matmul_dgrad.defvjp(_fwd, _bwd_dgrad)


# ---------------------------------------------------------------------------
# Grouped (sub-channel) w8a8: scales per (input-group, output-channel) for
# weights and per (token, input-group) for activations. The outlier-robust
# variant: a single amplified channel only degrades the resolution of its
# OWN group of `group` input dims instead of the whole row/column absmax
# window (LLM.int8()-style emergent outliers; quantified in
# scripts/int8_parity_study.py --weights outlier).
# ---------------------------------------------------------------------------

def _grouped_matmul_impl(x, kq, scale_g):
    """x (…, K) float; kq (K, N) int8; scale_g (G, N) f32 with G = K/g."""
    k_dim, n = kq.shape
    g_count = scale_g.shape[0]
    g = k_dim // g_count
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    x32 = x.reshape(m, g_count, g).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)   # (M, G, 1)
    xs = jnp.maximum(amax / 127.0, _EPS)
    xq = jnp.round(x32 / xs).astype(jnp.int8)

    kg = kq.reshape(g_count, g, n)
    # batched over groups: (G, M, g) × (G, g, N) → (G, M, N) int32
    out_g = jax.lax.dot_general(
        jnp.transpose(xq, (1, 0, 2)), kg,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    out = jnp.sum(out_g.astype(jnp.float32)
                  * jnp.transpose(xs, (1, 0, 2))            # (G, M, 1)
                  * scale_g[:, None, :], axis=0)            # (M, N)
    return out.reshape(*lead, n).astype(x.dtype)


def pallas_mesh_dispatch(pallas_fn, xla_fn, xla_sharded_fn, x, *consts):
    """Mesh-aware dispatch for a Pallas quant matmul.

    A pallas_call is a single-device program GSPMD cannot partition — on a
    sharded jit the SPMD partitioner would all-gather its operands to full
    global shape around every matmul (the same reason the sp/pp paths force
    the XLA formulations). Trace-time dispatch on the ambient mesh:

    - no mesh / all axes size 1 → today's per-platform choice
      (platform_dependent pallas on TPU, XLA elsewhere);
    - axes ⊆ {dp, tp} with the batch dividing dp → the SAME pallas call per
      device via a batch-sharded shard_map: weights are replicated (the
      quantized leaves carry no tp rule, core/mesh.py), rows are
      embarrassingly parallel, zero collectives. tp devices within a dp
      group compute the matmul redundantly — a deliberate tradeoff
      matching the tp-REPLICATED storage of quantized leaves (tp exists
      for the bf16 large-model path; quantized runs scale via dp, and with
      fully replicated operands GSPMD would replicate the XLA op too);
    - anything else (live sp/pp axes, indivisible batch) → the
      GSPMD-partitionable XLA formulation.
    """
    from ..core.mesh import DP_AXIS, TP_AXIS
    from .pallas import quant_matmul as _qm

    from ..core.mesh import manual_axes
    mesh = jax.sharding.get_abstract_mesh()
    manual = manual_axes(mesh)

    def per_device(x_loc, *cs):
        if _qm.INTERPRET:  # tests: force the kernel under the interpreter
            return pallas_fn(x_loc, *cs)
        if manual:
            # Inside a manual (pp) stage body the layer sweep is a scan
            # nested in the GPipe tick scan, and a platform_dependent cond
            # there makes nested-scan partial eval stack a per-layer packed
            # COPY of the weights as cond residuals (+4.2 GiB per 33B
            # stage — same disease as model/int4._ad_taint, measured by
            # tests/test_pipeline.py::test_pp_33b_step_compiles_within_
            # stage_hbm). Pick the branch at trace time instead: a pp mesh
            # context is a real-device run, so default_backend() IS the
            # lowering platform. Off-TPU use the SHARDED (scan) XLA
            # formulation — the batched grouped impl's (G, M, N)
            # intermediate is multi-GB per matmul at 33B stage shapes.
            if jax.default_backend() == "tpu":
                return pallas_fn(x_loc, *cs)
            return xla_sharded_fn(x_loc, *cs)
        return jax.lax.platform_dependent(x_loc, *cs, tpu=pallas_fn,
                                          default=xla_fn)
    # axes already manual (e.g. 'pp' inside a pipeline stage body) are
    # bound: the computation here is per-device along them already
    big = {ax: mesh.shape[ax] for ax in mesh.axis_names
           if mesh.shape[ax] > 1 and ax not in manual}
    if not big:
        return per_device(x, *consts)
    on_pallas_backend = jax.default_backend() == "tpu" or _qm.INTERPRET
    if (on_pallas_backend and set(big) <= {DP_AXIS, TP_AXIS}
            and x.shape[0] % big.get(DP_AXIS, 1) == 0):
        from jax.sharding import PartitionSpec as P

        # nested (inside the pipeline's pp shard_map): take manual only the
        # remaining auto axes — the default full-manual set would re-bind
        # 'pp' and fail to lower
        kw = ({"axis_names": frozenset(
            {a for a in (DP_AXIS, TP_AXIS) if a in mesh.axis_names}
            - manual)} if manual else {})
        return jax.shard_map(
            per_device,
            in_specs=(P(DP_AXIS),) + (P(),) * len(consts),
            out_specs=P(DP_AXIS),
            # pallas_call out_shapes carry no varying-mesh-axes info (same
            # reason as the sp flash wrappers)
            check_vma=False, **kw,
        )(x, *consts)
    return xla_sharded_fn(x, *consts)


# Above this (G, M, N) f32 intermediate size the batched-dot grouped
# formulation is swapped for the lax.scan one on non-Pallas lowerings —
# at 7B+ eval/serving shapes the batched dot costs multi-GB of HBM per
# matmul (one 13B cached-eval step compiled to 54.9 GiB of temps), while
# the scan keeps a single (M, N) accumulator live. Static-shape decision
# at trace time; tiny (test/CPU-dev) shapes keep the faster batched dot.
_BATCHED_INTERMEDIATE_LIMIT = 1 << 30


def _grouped_xla_pick(x, kq, scale_g):
    """Batched-dot or scan grouped formulation by static intermediate size
    (numerics agree to f32 sum order; gradients share one backward)."""
    m = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    inter = int(scale_g.shape[0]) * m * int(kq.shape[-1]) * 4
    return (_grouped_matmul_impl if inter <= _BATCHED_INTERMEDIATE_LIMIT
            else _grouped_matmul_scan)


def _grouped_dispatch(x, kq, scale_g):
    # On TPU the Pallas kernel keeps the per-group reduction in VMEM; the
    # XLA batched-dot formulation materializes a (G, M, N) f32 intermediate
    # in HBM (multi-GB at 7B shapes — above _BATCHED_INTERMEDIATE_LIMIT the
    # scan formulation is used instead). Numerics are identical — the XLA
    # path remains the oracle in tests and the CPU/interpret fallback.
    # Dispatch happens per lowering platform (platform_dependent), so a
    # CPU-placed computation on a TPU-default host still gets the XLA path;
    # on a multi-device mesh pallas_mesh_dispatch shard_maps over 'dp' (the
    # scan formulation covers every other sharded layout).
    from .pallas.quant_matmul import grouped_matmul_pallas, pallas_supported
    xla_fn = _grouped_xla_pick(x, kq, scale_g)
    if not pallas_supported(x, kq, scale_g):
        return xla_fn(x, kq, scale_g)
    return pallas_mesh_dispatch(grouped_matmul_pallas, xla_fn,
                                _grouped_matmul_scan, x, kq, scale_g)


def _dx_grouped_xla(g, kq, scale_g):
    """dx = g @ dequant(W)ᵀ in bf16 — materializes the dequantized (K, N)
    bf16 kernel (the XLA/oracle formulation)."""
    k_dim, n = kq.shape
    grp = k_dim // scale_g.shape[0]
    w = (kq.reshape(scale_g.shape[0], grp, n).astype(jnp.bfloat16)
         * scale_g[:, None, :].astype(jnp.bfloat16)).reshape(k_dim, n)
    return (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)


def _dx_dispatch(g, kq, scale_g):
    """Backward dequant matmul, mesh/platform-aware like the forward: the
    XLA form writes+reads an extra 2·K·N bytes of dequantized bf16 weights
    per matmul; on Pallas backends quant_dx_pallas dequantizes per block in
    VMEM (same elementwise bf16 rounding, f32 sum order differs over
    n-blocks)."""
    from .pallas.quant_matmul import dx_pallas_supported, quant_dx_pallas
    if not dx_pallas_supported(g, kq, scale_g):
        return _dx_grouped_xla(g, kq, scale_g)
    return pallas_mesh_dispatch(quant_dx_pallas, _dx_grouped_xla,
                                _dx_grouped_xla, g, kq, scale_g)


def _g_bwd(res, g):
    kq, scale_g = res
    dx = _dx_dispatch(g, kq, scale_g)
    zero = np.zeros((), jax.dtypes.float0)
    return (dx, np.broadcast_to(zero, kq.shape), jnp.zeros_like(scale_g))


def _grouped_matmul_scan(x, kq, scale_g):
    """Same semantics as _grouped_matmul_impl (exact int32 group dots,
    per-(token, group) absmax activation scales) but as a lax.scan over
    groups: only ONE (M, N) f32 accumulator is ever live, instead of the
    batched-dot's (G, M, N) intermediate — the memory-safe formulation for
    GSPMD-partitioned jits (sequence parallelism), where the Pallas kernel
    is unavailable and the batched dot would cost multi-GB per matmul at
    7B long-context shapes."""
    k_dim, n = kq.shape
    g_count = scale_g.shape[0]
    g = k_dim // g_count
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1

    x32 = x.reshape(m, g_count, g).astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, _EPS)
    xq = jnp.transpose(jnp.round(x32 / xs).astype(jnp.int8),
                       (1, 0, 2))                           # (G, M, g)
    kg = kq.reshape(g_count, g, n)                          # (G, g, N)
    xs_t = jnp.transpose(xs, (1, 0, 2))                     # (G, M, 1)

    def step(acc, operands):
        xq_g, kg_g, xs_g, sg_g = operands
        d = jax.lax.dot_general(xq_g, kg_g, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return acc + d.astype(jnp.float32) * xs_g * sg_g[None, :], None

    out, _ = jax.lax.scan(step, jnp.zeros((m, n), jnp.float32),
                          (xq, kg, xs_t, scale_g))
    return out.reshape(*lead, n).astype(x.dtype)


def _g_bwd_xla(res, g):
    """Pure-XLA backward for the _xla variants: never emits a pallas_call
    (their contract — GSPMD-partitioned jits and Mosaic escape hatches)."""
    kq, scale_g = res
    dx = _dx_grouped_xla(g, kq, scale_g)
    zero = np.zeros((), jax.dtypes.float0)
    return (dx, np.broadcast_to(zero, kq.shape), jnp.zeros_like(scale_g))


def _make_grouped_matmul(impl, bwd=None):
    """custom-VJP wrapper around a grouped-matmul primal: the backward
    (dx = g @ dequant(W)ᵀ in bf16, packed/int residuals only) is shared —
    only the primal implementation (and, for the pure-XLA variants, the
    backward dispatch) differs between variants."""

    @jax.custom_vjp
    def f(x, kq, scale_g):
        return impl(x, kq, scale_g)

    def fwd(x, kq, scale_g):
        return impl(x, kq, scale_g), (kq, scale_g)

    f.defvjp(fwd, bwd or _g_bwd)
    return f


int8_matmul_grouped = _make_grouped_matmul(_grouped_dispatch)
# XLA-only variant: under sequence parallelism (GSPMD-partitioned jit) a
# pallas_call is a single-device program — its operands would be gathered
# to full shape around every matmul, negating the sp sharding. The scan
# formulation partitions natively AND never materializes the batched
# dot's (G, M, N) intermediate. Numerics identical up to f32 sum order.
# The backward is pure XLA too — no pallas_call in either direction.
int8_matmul_grouped_xla = _make_grouped_matmul(_grouped_matmul_scan,
                                               bwd=_g_bwd_xla)
