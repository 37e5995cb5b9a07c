"""Pallas grouped w8a8 matmul vs the XLA oracle (interpret mode on CPU).

model/int8.py `_grouped_matmul_impl` is the reference semantics (itself
oracle-tested against dequantized bf16 matmuls in test_quantize.py); the
Pallas kernel must reproduce it bit-for-bit up to f32 accumulation order —
same per-(row, 128-wide group) absmax activation quantization, same
(K/group, N) weight scales.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from flipped_tpu.ckpt.quantize import quantize_kernel
from flipped_tpu.model.int8 import _grouped_matmul_impl
from flipped_tpu.model.pallas.quant_matmul import grouped_matmul_pallas


def _case(m, k, n, group=128, seed=0):
    rs = np.random.RandomState(seed)
    w = rs.randn(k, n).astype(np.float32) / np.sqrt(k)
    # an outlier row, so group scales genuinely differ
    w[min(3, k - 1), :] *= 25.0
    q = quantize_kernel(w, group)
    x = jnp.array(rs.randn(m, k).astype(np.float32))
    return x, jnp.array(q["kernel_q"]), jnp.array(q["scale"])


@pytest.mark.parametrize("m,k,n", [
    (24, 256, 256),    # single block in every dim (with m padding 24→32)
    (40, 1024, 384),   # multi-block: 3 m-blocks × 3 n-blocks × 2 k-blocks
    (8, 256, 128),     # decode-sized m → 16-row tile, heavy padding
])
def test_pallas_matches_xla_oracle(m, k, n):
    x, kq, sg = _case(m, k, n)
    ref = np.asarray(_grouped_matmul_impl(x, kq, sg))
    got = np.asarray(grouped_matmul_pallas(x, kq, sg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_leading_dims_and_bf16():
    x, kq, sg = _case(24, 256, 256)
    x3 = x.reshape(2, 12, 256).astype(jnp.bfloat16)
    ref = np.asarray(_grouped_matmul_impl(x3, kq, sg), np.float32)
    got = np.asarray(grouped_matmul_pallas(x3, kq, sg, interpret=True),
                     np.float32)
    assert got.shape == (2, 12, 256)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_unaligned_group_falls_back_to_xla():
    # group=64 is not a multiple of the 128-lane tile → XLA path
    x, kq, sg = _case(16, 256, 128, group=64)
    assert sg.shape[0] == 4
    ref = np.asarray(_grouped_matmul_impl(x, kq, sg))
    got = np.asarray(grouped_matmul_pallas(x, kq, sg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_zero_rows_safe():
    x, kq, sg = _case(24, 256, 256)
    x = x.at[5].set(0.0)
    got = np.asarray(grouped_matmul_pallas(x, kq, sg, interpret=True))
    assert np.all(np.isfinite(got))
    assert np.allclose(got[5], 0.0)


# --- packed int4 kernel (model/int4.py layout) -------------------------------

def _case_int4(m, k, n, group=128, seed=0):
    rs = np.random.RandomState(seed)
    w = rs.randn(k, n).astype(np.float32) / np.sqrt(k)
    w[min(3, k - 1), :] *= 25.0
    q = quantize_kernel(w, group, bits=4)
    x = jnp.array(rs.randn(m, k).astype(np.float32))
    return x, jnp.array(q["kernel_q4"]), jnp.array(q["scale"])


@pytest.mark.parametrize("m,k,n", [
    (24, 256, 512),    # single n-half block per half
    (40, 1024, 768),   # multi-block: 2 k-blocks, odd n-half split 384=3·128
    (8, 256, 256),     # decode-sized m
])
def test_int4_pallas_matches_xla_on_unpacked(m, k, n):
    from flipped_tpu.model.int4 import unpack_int4
    from flipped_tpu.model.pallas.quant_matmul import (
        int4_matmul_grouped_pallas, int4_pallas_supported)
    x, kq4, sg = _case_int4(m, k, n)
    assert int4_pallas_supported(x, kq4, sg)
    ref = np.asarray(_grouped_matmul_impl(x, unpack_int4(kq4), sg))
    got = np.asarray(int4_matmul_grouped_pallas(x, kq4, sg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_int4_pallas_unaligned_falls_back():
    from flipped_tpu.model.pallas.quant_matmul import (
        int4_matmul_grouped_pallas, int4_pallas_supported)
    # group 64 < 128 lanes → guard refuses, XLA path still correct
    x, kq4, sg = _case_int4(16, 256, 256, group=64)
    assert not int4_pallas_supported(x, kq4, sg)
    from flipped_tpu.model.int4 import unpack_int4
    ref = np.asarray(_grouped_matmul_impl(x, unpack_int4(kq4), sg))
    got = np.asarray(int4_matmul_grouped_pallas(x, kq4, sg, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_int4_pallas_weight_only_close_to_dequant():
    """act_quant=False kernel: bf16 dots on raw 4-bit values with per-group
    scales on the partial products ≈ x @ dequant(W) (bf16 accumulation-order
    differences only)."""
    from flipped_tpu.ckpt.quantize import dequantize_kernel
    from flipped_tpu.model.pallas.quant_matmul import int4_matmul_grouped_pallas
    x, kq4, sg = _case_int4(24, 256, 512)
    node = {"kernel_q4": kq4, "scale": sg}
    want = np.asarray(x) @ dequantize_kernel(node).astype(np.float32)
    got = np.asarray(int4_matmul_grouped_pallas(x, kq4, sg, interpret=True,
                                                act_quant=False))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


# --- mesh-aware dispatch (model/int8.py pallas_mesh_dispatch) ----------------
#
# A pallas_call is a single-device program GSPMD cannot partition: under a
# multi-device mesh the quant matmuls must run per-device via a batch-sharded
# shard_map (dp axes) or fall back to the GSPMD-partitionable XLA
# formulations (anything else). Interpret mode drives the real kernel on the
# virtual CPU mesh.

def _cpu_mesh(cfg_kwargs, n):
    import jax
    from flipped_tpu.core.config import MeshConfig
    from flipped_tpu.core.mesh import make_mesh
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"needs {n} virtual CPU devices")
    return make_mesh(MeshConfig(**cfg_kwargs), devices=devs[:n])


def test_grouped_dispatch_dp_shard_map_matches_xla():
    """dp2 ambient mesh: the grouped w8a8 custom VJP runs the Pallas kernel
    per-device via a batch-sharded shard_map — outputs and dx match the XLA
    oracle."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import flipped_tpu.model.pallas.quant_matmul as qm
    from flipped_tpu.model.int8 import int8_matmul_grouped

    x, kq, sg = _case(8, 256, 128)
    ref = np.asarray(_grouped_matmul_impl(x, kq, sg))

    mesh = _cpu_mesh(dict(dp=2), 2)
    old = qm.INTERPRET
    qm.INTERPRET = True
    try:
        # single-device reference under the SAME interpret-mode kernels
        # (fwd + dx), so the shard_map split is the only variable
        dx_ref = np.asarray(jax.jit(jax.grad(
            lambda a: int8_matmul_grouped(a, kq, sg).sum()))(x))
        with jax.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
            got = np.asarray(jax.jit(
                lambda a: int8_matmul_grouped(a, kq, sg))(xs))
            dx = np.asarray(jax.jit(jax.grad(
                lambda a: int8_matmul_grouped(a, kq, sg).sum()))(xs))
    finally:
        qm.INTERPRET = old
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dx, dx_ref, rtol=1e-5, atol=1e-5)


def test_int4_dispatch_dp_shard_map_matches_xla():
    """dp2 ambient mesh: the packed-int4 w4a8 custom VJP runs the Pallas
    kernel per-device via the batch-sharded shard_map."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import flipped_tpu.model.pallas.quant_matmul as qm
    from flipped_tpu.model.int4 import int4_matmul_grouped, unpack_int4

    x, kq4, sg = _case_int4(8, 256, 256)
    ref = np.asarray(_grouped_matmul_impl(x, unpack_int4(kq4), sg))

    mesh = _cpu_mesh(dict(dp=2), 2)
    old = qm.INTERPRET
    qm.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
            got = np.asarray(jax.jit(
                lambda a: int4_matmul_grouped(a, kq4, sg))(xs))
    finally:
        qm.INTERPRET = old
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grouped_dispatch_sp_mesh_falls_back_to_scan():
    """A live non-dp axis (sp2) must NOT shard_map the kernel — the scan
    formulation (GSPMD-partitionable) carries the matmul, exactly."""
    import jax
    import flipped_tpu.model.pallas.quant_matmul as qm
    from flipped_tpu.model.int8 import int8_matmul_grouped

    x, kq, sg = _case(8, 256, 128)
    ref = np.asarray(_grouped_matmul_impl(x, kq, sg))
    mesh = _cpu_mesh(dict(dp=1, sp=2), 2)
    old = qm.INTERPRET
    qm.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            got = np.asarray(jax.jit(
                lambda a: int8_matmul_grouped(a, kq, sg))(x))
    finally:
        qm.INTERPRET = old
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# --- backward (dx) kernels ---------------------------------------------------
#
# dx = g @ dequant(W)ᵀ. The XLA backward materializes the dequantized bf16
# (K, N) kernel in HBM; the dx kernels dequantize per block in VMEM with the
# SAME elementwise bf16 rounding — only the f32 sum order over n-blocks
# differs.

@pytest.mark.parametrize("m,k,n", [
    (24, 256, 256),
    (40, 1024, 384),
    (8, 256, 128),
])
def test_quant_dx_pallas_matches_xla(m, k, n):
    from flipped_tpu.model.int8 import _dx_grouped_xla
    from flipped_tpu.model.pallas.quant_matmul import (dx_pallas_supported,
                                                       quant_dx_pallas)
    _, kq, sg = _case(m, k, n)
    rs = np.random.RandomState(1)
    g = jnp.array(rs.randn(m, n).astype(np.float32))
    assert dx_pallas_supported(g, kq, sg)
    ref = np.asarray(_dx_grouped_xla(g, kq, sg))
    got = np.asarray(quant_dx_pallas(g, kq, sg, interpret=True))
    assert got.shape == ref.shape
    # up to one bf16 ulp: f32 partial sums over n-blocks can cross a
    # rounding boundary the single-dot accumulation doesn't
    np.testing.assert_allclose(got, ref, rtol=8e-3, atol=1e-5)
    assert np.mean(got == ref) > 0.99


def test_quant_dx_pallas_leading_dims():
    from flipped_tpu.model.int8 import _dx_grouped_xla
    from flipped_tpu.model.pallas.quant_matmul import quant_dx_pallas
    _, kq, sg = _case(24, 256, 256)
    rs = np.random.RandomState(2)
    g = jnp.array(rs.randn(2, 12, 256).astype(np.float32))
    ref = np.asarray(_dx_grouped_xla(g, kq, sg))
    got = np.asarray(quant_dx_pallas(g, kq, sg, interpret=True))
    assert got.shape == (2, 12, 256)
    np.testing.assert_allclose(got, ref, rtol=8e-3, atol=1e-5)
    assert np.mean(got == ref) > 0.99


@pytest.mark.parametrize("m,k,n", [
    (24, 256, 512),
    (40, 1024, 768),
    (8, 256, 256),
])
def test_int4_dx_pallas_matches_xla(m, k, n):
    from flipped_tpu.model.int4 import _int4_dx_xla
    from flipped_tpu.model.pallas.quant_matmul import int4_dx_pallas
    _, kq4, sg = _case_int4(m, k, n)
    rs = np.random.RandomState(1)
    g = jnp.array(rs.randn(m, n).astype(np.float32))
    ref = np.asarray(_int4_dx_xla(g, kq4, sg))
    got = np.asarray(int4_dx_pallas(g, kq4, sg, interpret=True))
    assert got.shape == ref.shape
    # up to one bf16 ulp: f32 partial sums over n-blocks can cross a
    # rounding boundary the single-dot accumulation doesn't
    np.testing.assert_allclose(got, ref, rtol=8e-3, atol=1e-5)
    exact = np.mean(got == ref)
    assert exact > 0.99, exact


@pytest.mark.parametrize("pallas_route", [False, True])
def test_plain_int8_bwd_matches_direct(pallas_route, monkeypatch):
    """Per-channel int8 backward, BOTH routes: the default takes the direct
    XLA bf16(kq)·bf16(scale) branch (measured faster on v5e for per-channel
    scales, model/int8.py:69-78); FLIPPED_DX_PALLAS_PER_CHANNEL=1 (read at
    trace time) re-routes through the grouped dx dispatch with 128-wide
    broadcast scale groups. Each must reproduce the direct formulation's
    numerics — this keeps the env-gated escape hatch covered, not just the
    default."""
    import flipped_tpu.model.pallas.quant_matmul as qm
    from flipped_tpu.model.int8 import _bwd
    monkeypatch.setenv("FLIPPED_DX_PALLAS_PER_CHANNEL",
                       "1" if pallas_route else "0")
    if pallas_route:
        monkeypatch.setattr(qm, "INTERPRET", True)
    rs = np.random.RandomState(0)
    kq = jnp.array(rs.randint(-127, 128, (256, 128)), jnp.int8)
    scale = jnp.array(np.abs(rs.randn(128)).astype(np.float32))
    g = jnp.array(rs.randn(8, 128).astype(np.float32))
    dx = np.asarray(_bwd((kq, scale), g)[0])
    w = kq.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)[None, :]
    ref = np.asarray((g.astype(jnp.bfloat16) @ w.T).astype(g.dtype))
    # the Pallas route accumulates f32 partials per 128-row group — up to
    # one bf16 ulp of sum-order difference vs the single full-width dot
    tol = dict(rtol=8e-3, atol=1e-5) if pallas_route else dict(rtol=1e-6,
                                                               atol=1e-6)
    np.testing.assert_allclose(dx, ref, **tol)


def test_grouped_dispatch_nests_inside_manual_pp():
    """Inside a pipeline stage body ('pp' already manual), the dispatch must
    treat pp as bound and still run the Pallas kernel per device via a
    nested shard_map over the remaining auto axes (dp here)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import flipped_tpu.model.pallas.quant_matmul as qm
    from flipped_tpu.model.int8 import int8_matmul_grouped

    x, kq, sg = _case(8, 256, 128)
    ref = np.asarray(_grouped_matmul_impl(x, kq, sg))
    mesh = _cpu_mesh(dict(dp=2, pp=2), 4)
    old = qm.INTERPRET
    qm.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P("dp")))

            def outer(xx, kql, sgl):
                def body(xl, kq_, sg_):
                    return int8_matmul_grouped(xl, kq_, sg_)
                return jax.shard_map(body, in_specs=(P(), P(), P()),
                                     out_specs=P(), axis_names={"pp"},
                                     check_vma=False)(xx, kql, sgl)

            got = np.asarray(jax.jit(outer)(xs, kq, sg))
    finally:
        qm.INTERPRET = old
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused w8a8d dgrad kernel: bit-exact vs the XLA formulation (the SR dither
# hash is position-dependent, so exactness proves the kernel reconstructs
# the global (row % S, col) iota coordinates correctly, not just the math).
# ---------------------------------------------------------------------------

def _dgrad_case(m, k, n, seed=3):
    rs = np.random.RandomState(seed)
    kq = jnp.array(rs.randint(-127, 128, size=(k, n)).astype(np.int8))
    scale = jnp.array((rs.rand(n).astype(np.float32) + 0.5) / np.sqrt(k))
    # heavy-tailed cotangent: one spike per row so SR genuinely matters
    g = rs.randn(m, n).astype(np.float32)
    g[np.arange(m), rs.randint(0, n, size=m)] *= 40.0
    return jnp.array(g, jnp.bfloat16), kq, scale


@pytest.mark.parametrize("m,k,n", [
    (24, 256, 256),    # m padding 24→32, single k block
    (40, 1024, 384),   # multi k-block, 3-chunk-free n
    (8, 384, 256),     # decode-sized m, k not a bk multiple (bk shrinks)
])
def test_dgrad_pallas_bit_exact_vs_xla(m, k, n, monkeypatch):
    from flipped_tpu.model.int8 import _dgrad_dx_xla
    from flipped_tpu.model.pallas.quant_matmul import (
        dgrad_pallas_supported, int8_dgrad_pallas)
    g, kq, scale = _dgrad_case(m, k, n)
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "1")  # opt-in since r05
    assert dgrad_pallas_supported(g, kq)
    ref = np.asarray(_dgrad_dx_xla(g, kq, scale), np.float32)
    got = np.asarray(int8_dgrad_pallas(g, kq, scale, interpret=True),
                     np.float32)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_dgrad_pallas_3d_row_dither_bit_exact():
    """(B, S, N) cotangents: XLA's dither row-iota runs over dim -2 (the S
    axis, no batch term) — the kernel must reproduce flat_row % S, which
    DIFFERS from the flat row index as soon as B > 1."""
    from flipped_tpu.model.int8 import _dgrad_dx_xla
    from flipped_tpu.model.pallas.quant_matmul import int8_dgrad_pallas
    g, kq, scale = _dgrad_case(96, 256, 256)
    g3 = g.reshape(4, 24, 256)
    ref = np.asarray(_dgrad_dx_xla(g3, kq, scale), np.float32)
    got = np.asarray(int8_dgrad_pallas(g3, kq, scale, interpret=True),
                     np.float32)
    assert got.shape == (4, 24, 256)
    np.testing.assert_array_equal(got, ref)


def test_dgrad_n_chunking_covers_11008_like_dims():
    """The chunked quantize must tile n with 128-aligned chunks; exercise a
    dim that forces >1 chunk (n > _DGRAD_CHUNK) end-to-end."""
    from flipped_tpu.model.pallas import quant_matmul as qm
    # force chunking at a test-sized n
    orig = qm._DGRAD_CHUNK
    qm.__dict__["_DGRAD_CHUNK"] = 256
    try:
        from flipped_tpu.model.int8 import _dgrad_dx_xla
        g, kq, scale = _dgrad_case(16, 256, 768)   # 3 chunks of 256
        assert qm._dgrad_chunks(768) == 3
        ref = np.asarray(_dgrad_dx_xla(g, kq, scale), np.float32)
        got = np.asarray(qm.int8_dgrad_pallas(g, kq, scale, interpret=True),
                         np.float32)
        np.testing.assert_array_equal(got, ref)
    finally:
        qm.__dict__["_DGRAD_CHUNK"] = orig
    # the real 7B ffn dim: two 5504-lane chunks
    assert qm._dgrad_chunks(11008) == 2
    assert qm._dgrad_chunks(4096) == 1


def test_dgrad_env_gate_opt_in(monkeypatch):
    """The fused dgrad is OPT-IN (measured slower than the unfused XLA
    formulation on v5e — dgrad_pallas_supported docstring): unset/0 → XLA,
    1 → fused kernel."""
    from flipped_tpu.model.pallas.quant_matmul import dgrad_pallas_supported
    g, kq, _ = _dgrad_case(16, 256, 256)
    monkeypatch.delenv("FLIPPED_DGRAD_PALLAS", raising=False)
    assert not dgrad_pallas_supported(g, kq)
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "0")
    assert not dgrad_pallas_supported(g, kq)
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "1")
    assert dgrad_pallas_supported(g, kq)


def test_dgrad_dispatch_full_bwd_matches_xla(monkeypatch):
    """int8_matmul_dgrad's VJP routed through the fused kernel (INTERPRET
    forced) equals the XLA-only route — end-to-end through jax.grad."""
    import jax
    from flipped_tpu.model import int8
    from flipped_tpu.model.pallas import quant_matmul as qm
    g, kq, scale = _dgrad_case(24, 256, 256)
    x = jnp.array(np.random.RandomState(9).randn(2, 12, 256), jnp.bfloat16)

    def loss(x):
        return int8.int8_matmul_dgrad(x, kq, scale).astype(jnp.float32).sum()

    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "0")
    ref = np.asarray(jax.grad(loss)(x), np.float32)
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "1")  # opt-in since r05
    monkeypatch.setattr(qm, "INTERPRET", True)
    got = np.asarray(jax.grad(loss)(x), np.float32)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# Fused per-channel w8a8 FORWARD kernel vs _int8_matmul_fwd_impl (bit-exact:
# RTN quantize, reciprocal-multiply scales pinned in both formulations).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("m,k,n", [
    (24, 256, 256),
    (40, 1024, 384),
    (8, 384, 256),
])
def test_fwd_pallas_bit_exact_vs_xla(m, k, n, monkeypatch):
    from flipped_tpu.model.int8 import _int8_matmul_fwd_impl
    from flipped_tpu.model.pallas.quant_matmul import (
        fwd_pallas_supported, int8_fwd_pallas)
    rs = np.random.RandomState(11)
    x = jnp.array(rs.randn(m, k).astype(np.float32), jnp.bfloat16)
    kq = jnp.array(rs.randint(-127, 128, size=(k, n)).astype(np.int8))
    scale = jnp.array((rs.rand(n).astype(np.float32) + 0.5) / np.sqrt(k))
    monkeypatch.setenv("FLIPPED_FWD_PALLAS", "1")  # opt-in since r05
    assert fwd_pallas_supported(x, kq)
    ref = np.asarray(_int8_matmul_fwd_impl(x, kq, scale), np.float32)
    got = np.asarray(int8_fwd_pallas(x, kq, scale, interpret=True),
                     np.float32)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_fwd_pallas_3d_and_chunked():
    from flipped_tpu.model.int8 import _int8_matmul_fwd_impl
    from flipped_tpu.model.pallas import quant_matmul as qm
    orig = qm._DGRAD_CHUNK
    qm.__dict__["_DGRAD_CHUNK"] = 256
    try:
        rs = np.random.RandomState(12)
        x3 = jnp.array(rs.randn(4, 24, 768).astype(np.float32), jnp.bfloat16)
        kq_t = jnp.array(rs.randint(-127, 128, size=(768, 256))
                         .astype(np.int8))
        sc = jnp.array((rs.rand(256).astype(np.float32) + 0.5) / 16.0)
        assert qm._dgrad_chunks(768) == 3
        ref = np.asarray(_int8_matmul_fwd_impl(x3, kq_t, sc), np.float32)
        got = np.asarray(qm.int8_fwd_pallas(x3, kq_t, sc,
                                            interpret=True), np.float32)
        np.testing.assert_array_equal(got, ref)
    finally:
        qm.__dict__["_DGRAD_CHUNK"] = orig


def test_fwd_env_gate_opt_in(monkeypatch):
    """The fused forward is OPT-IN (measured slower than XLA on v5e —
    fwd_pallas_supported docstring): unset/0 → XLA, 1 → fused kernel."""
    from flipped_tpu.model.pallas.quant_matmul import fwd_pallas_supported
    x = jnp.ones((16, 256), jnp.bfloat16)
    kq = jnp.ones((256, 256), jnp.int8)
    monkeypatch.delenv("FLIPPED_FWD_PALLAS", raising=False)
    assert not fwd_pallas_supported(x, kq)
    monkeypatch.setenv("FLIPPED_FWD_PALLAS", "0")
    assert not fwd_pallas_supported(x, kq)
    monkeypatch.setenv("FLIPPED_FWD_PALLAS", "1")
    assert fwd_pallas_supported(x, kq)
