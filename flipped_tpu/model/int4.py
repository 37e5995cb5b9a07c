"""4-bit weight quantization of the frozen backbone (int4 / w4a8).

Storage is PACKED: two int4 values per int8 byte, packed along the OUTPUT
feature dim in a split-half layout — byte (k, j) of `kernel_q4` (K, N/2)
holds output column j in its low nibble and column j + N/2 in its high
nibble. Keeping the input dim K intact means every K-side mechanism of the
int8 path (128-wide grouped scales, the builder's group inference, the
per-(token, group) activation quantization) applies unchanged, and the
split-half layout unpacks as two shifts + one concat (no lane interleave).

Grouped (sub-channel) scales are mandatory at 4 bits: per-channel absmax
over 4096 input dims leaves ~3 bits of signal. Levels are symmetric ±7
(scale = group absmax / 7).

Why int4 exists here: the frozen 7B backbone is 12.6 GB bf16 → 6.3 GB int8
→ **3.2 GB packed int4** (+0.4 GB f32 group scales). The 16 GB v5e capacity
walls measured in docs/PERF.md — batch 16 no-remat over by 1.35 GB, the
3-objective S=4096 stack over by 1.26 GB, 13B batch limits — are exactly
weight-capacity walls, and the frozen-backbone + f32-adapter setting is the
QLoRA regime where 4-bit frozen weights are established practice. Compose
with the residual-stream rotation (--quantize int4r|w4a8r, ckpt/rotate.py)
for outlier-immune absmax windows; quantify with
scripts/int8_parity_study.py --phase int4|w4a8.

The reference runs the whole backbone in fp16 (llama_vqa.py:63-65); any
quantization is an addition over it. The LM head ('output') stays int8
weight-only even in int4 modes — its logits feed the eval argmin
(engine.py:87-93) directly, and it is 0.13 GB at 7B.

Both matmuls carry custom VJPs whose residuals are the PACKED weights: the
backward re-unpacks (cheap VPU work) instead of pinning an unpacked int8
copy of the backbone between forward and backward, which would cancel the
capacity win under no-remat.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def pack_int4(q: np.ndarray) -> np.ndarray:
    """(K, N) int8 values in [-8, 7] → (K, N/2) packed int8 (split-half
    layout: low nibble = column j, high nibble = column j + N/2)."""
    k, n = q.shape
    if n % 2:
        raise ValueError(f"int4 packing needs an even output dim, got {n}")
    lo = (np.asarray(q[:, : n // 2], np.int8).view(np.uint8) & 0xF)
    hi = (np.asarray(q[:, n // 2:], np.int8).view(np.uint8) & 0xF)
    return (lo | (hi << 4)).view(np.int8)


def unpack_int4(kq4: jax.Array) -> jax.Array:
    """(K, N/2) packed int8 → (K, N) int8 values in [-8, 7]."""
    lo = jnp.right_shift(jnp.left_shift(kq4, 4), 4)  # sign-extend low nibble
    hi = jnp.right_shift(kq4, 4)                     # arithmetic shift
    return jnp.concatenate([lo, hi], axis=-1)


def unpack_int4_np(kq4: np.ndarray) -> np.ndarray:
    b = np.asarray(kq4, np.int8)
    lo = (b.view(np.uint8) & 0xF).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo).astype(np.int8)
    hi = (b.view(np.uint8) >> 4).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi).astype(np.int8)
    return np.concatenate([lo, hi], axis=-1)


def _dequant_bf16(kq4, scale_g):
    """Unpack + grouped dequant → (K, N) bf16 kernel."""
    w = unpack_int4(kq4)                             # (K, N) int8
    k_dim, n = w.shape
    g_count = scale_g.shape[0]
    group = k_dim // g_count
    w = (w.reshape(g_count, group, n).astype(jnp.bfloat16)
         * scale_g[:, None, :].astype(jnp.bfloat16)).reshape(k_dim, n)
    return w


def _zero_tangents(kq4, scale_g):
    zero = np.zeros((), jax.dtypes.float0)
    return np.broadcast_to(zero, kq4.shape), jnp.zeros_like(scale_g)


def _ad_taint(ref, *arrs):
    """Data-depend the weight-only operands on the activations with an
    exact zero, so autodiff partial evaluation classifies the unpack /
    dequant chain UNKNOWN and recomputes it in the backward.

    Without this, the packed-residual contract above silently breaks under
    NESTED scans: when the pipeline's GPipe tick scan (model/pipeline.py)
    wraps the stage's layer scan, partial eval splits the custom-VJP fwd
    jaxpr, hoists everything derivable from the (known) weights out of the
    loop, and SAVES it — stacking the fully unpacked int8 backbone of the
    stage between forward and backward. Measured on the pp=4 33B w4a8
    step's XLA memory analysis: 9.89 GiB of temps (≈8 GiB of it stacked
    s8[15,K,N] unpacked kernels + f32 scale broadcasts) vs 1-2 GiB with
    the taint — the difference between a 33B stage fitting a 16 GB v5e
    and not (tests/test_pipeline.py::test_pp_33b_step_compiles_within_
    stage_hbm). The zero is NaN-proof ((ref != ref) & False is always
    False) and XLA folds the add away after the residual split is decided,
    so compiled numerics and speed are untouched."""
    z = jnp.logical_and(ref.ravel()[0] != ref.ravel()[0], False)
    return tuple(a + z.astype(a.dtype) for a in arrs)


def ad_taint_in_manual_mesh(ref, *arrs):
    """`_ad_taint`, gated on a manual mesh axis being in scope (the pp
    stage-body context, model/pipeline.py).

    For the WEIGHT-ONLY dequants in llama.Dense there is no custom VJP:
    plain autodiff saves the dequantized bf16/f32 kernel as a residual,
    and under the pipeline's nested scans that residual is stacked per
    layer — measured 34.7 GiB of temps on the 33B pp=4 weight-only-int8
    step's XLA memory analysis (vs 3-5 GiB with the taint). Gating on the
    manual-axis context keeps the measured single-device int8 paths'
    residual behavior byte-identical (docs/PERF.md capacity tables)."""
    from ..core.mesh import manual_axes
    if not manual_axes():
        return arrs
    return _ad_taint(ref, *arrs)


def _int4_dx_xla(g, kq4, scale_g):
    w = _dequant_bf16(kq4, scale_g)
    return (g.astype(jnp.bfloat16) @ w.T).astype(g.dtype)


def _int4_bwd(res, g):
    """Shared backward for every int4 matmul variant: dx = g @ dequant(W)ᵀ
    in bf16, residuals are the PACKED weights only. On Pallas backends the
    dx kernel reads the packed block once and dequantizes in VMEM — the
    XLA form unpacks to (K, N) int8 AND dequantizes to (K, N) bf16 in HBM
    per matmul (mesh-aware dispatch, like the forward)."""
    kq4, scale_g = res
    from .int8 import pallas_mesh_dispatch
    from .pallas.quant_matmul import int4_dx_pallas, int4_pallas_supported

    if not int4_pallas_supported(g, kq4, scale_g):
        dx = _int4_dx_xla(g, kq4, scale_g)
    else:
        dx = pallas_mesh_dispatch(int4_dx_pallas, _int4_dx_xla,
                                  _int4_dx_xla, g, kq4, scale_g)
    return (dx, *_zero_tangents(kq4, scale_g))


def _int4_bwd_xla(res, g):
    """Pure-XLA backward for the _xla variants (contract: no pallas_call in
    either direction)."""
    kq4, scale_g = res
    return (_int4_dx_xla(g, kq4, scale_g), *_zero_tangents(kq4, scale_g))


def _make_int4_matmul(impl, doc, bwd=None):
    @jax.custom_vjp
    def f(x, kq4, scale_g):
        return impl(x, kq4, scale_g)

    def fwd(x, kq4, scale_g):
        return impl(x, kq4, scale_g), (kq4, scale_g)

    f.defvjp(fwd, bwd or _int4_bwd)
    f.__doc__ = doc
    return f


# --- weight-only int4: dequantize into a bf16 matmul -------------------------

def _wo_xla_impl(x, kq4, scale_g):
    kq4, scale_g = _ad_taint(x, kq4, scale_g)
    return (x @ _dequant_bf16(kq4, scale_g).astype(x.dtype)).astype(x.dtype)


def _wo_impl(x, kq4, scale_g):
    # TPU: the packed kernel runs bf16 dots on the raw 4-bit values and
    # scales the per-group partial products — no (K, N) bf16 dequant buffer
    # (2 bytes/elt, 4× the packed bytes) ever exists in HBM. Multi-device
    # meshes go through pallas_mesh_dispatch (a pallas_call is a single-
    # device program — batch-sharded shard_map over 'dp', XLA elsewhere).
    from .int8 import pallas_mesh_dispatch
    from .pallas.quant_matmul import (int4_matmul_grouped_pallas,
                                      int4_pallas_supported)

    if not int4_pallas_supported(x, kq4, scale_g):
        return _wo_xla_impl(x, kq4, scale_g)
    return pallas_mesh_dispatch(
        functools.partial(int4_matmul_grouped_pallas, act_quant=False),
        _wo_xla_impl, _wo_xla_impl, x, kq4, scale_g)


int4_matmul = _make_int4_matmul(
    _wo_impl,
    "x (…, K) float; kq4 (K, N/2) packed int8; scale_g (G, N) f32 → "
    "(…, N) x.dtype. Weight-only: the matmul runs in x.dtype.")
# XLA-only variant for GSPMD-partitioned jits (sequence parallelism)
int4_matmul_xla = _make_int4_matmul(
    _wo_xla_impl, int4_matmul.__doc__ + " XLA formulation only.",
    bwd=_int4_bwd_xla)


# --- w4a8: int8 activations × unpacked int4 weights on the MXU ---------------

def _w4a8_xla_impl(x, kq4, scale_g):
    # batched dot below _BATCHED_INTERMEDIATE_LIMIT, lax.scan above (the
    # (G, M, N) f32 intermediate is multi-GB at 7B+ shapes — int8.py)
    from .int8 import _grouped_xla_pick
    kq4, scale_g = _ad_taint(x, kq4, scale_g)
    kq = unpack_int4(kq4)
    return _grouped_xla_pick(x, kq, scale_g)(x, kq, scale_g)


def _w4a8_impl(x, kq4, scale_g):
    # Unpacked values live in [-8, 7]: valid int8 contents, so the grouped
    # w8a8 semantics (same per-(token, group) absmax activation scales)
    # apply verbatim. On TPU a dedicated Pallas kernel reads the PACKED
    # block and unpacks nibbles in VMEM — the XLA formulation would
    # materialize an unpacked (K, N) int8 copy in HBM per matmul, giving
    # back the bandwidth the packing bought.
    from .int8 import pallas_mesh_dispatch
    from .pallas.quant_matmul import (int4_matmul_grouped_pallas,
                                      int4_pallas_supported)

    if not int4_pallas_supported(x, kq4, scale_g):
        return _w4a8_xla_impl(x, kq4, scale_g)
    return pallas_mesh_dispatch(int4_matmul_grouped_pallas, _w4a8_xla_impl,
                                _w4a8_scan_impl, x, kq4, scale_g)


int4_matmul_grouped = _make_int4_matmul(
    _w4a8_impl,
    "x (…, K) float; kq4 (K, N/2) packed int8; scale_g (G, N) f32 → "
    "(…, N) x.dtype, activations quantized per (token, 128-wide group).")
def _w4a8_scan_impl(x, kq4, scale_g):
    from .int8 import _grouped_matmul_scan
    kq4, scale_g = _ad_taint(x, kq4, scale_g)
    return _grouped_matmul_scan(x, unpack_int4(kq4), scale_g)


# XLA-only variant for GSPMD-partitioned jits (sequence parallelism) — a
# pallas_call is a single-device program and would force gathers around
# every matmul; the scan formulation also avoids the batched dot's
# (G, M, N) intermediate. Numerics identical up to f32 sum order.
int4_matmul_grouped_xla = _make_int4_matmul(
    _w4a8_scan_impl, int4_matmul_grouped.__doc__ + " XLA scan formulation.",
    bwd=_int4_bwd_xla)
