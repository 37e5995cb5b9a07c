"""Host-side TPU (Mosaic) lowering regression for every Pallas kernel.

The interpret-mode parity tests execute the kernels through the Pallas
interpreter on CPU — they validate numerics but never run the Mosaic
TPU lowering pipeline, so a kernel can be interpret-green yet fail to
lower on a real TPU (found live: the dx kernels' sliced ``.at[].add``
accumulation lowered to scatter-add, which Mosaic rejects —
``NotImplementedError: Unimplemented primitive … scatter-add``).

Mosaic lowering happens host-side at ``jax.jit(...).lower()`` time, so
it needs NO TPU device: these tests AOT-lower each kernel wrapper for
platform 'tpu' on the CPU host and assert the lowering succeeds. Any
primitive Mosaic cannot lower (scatter, unsupported layouts, bad block
shapes) raises here, in the fast suite, instead of in the first real
TPU run.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import pytest

from flipped_tpu.model.pallas import quant_matmul as qm
from flipped_tpu.model.pallas import flash_attention as fa


@pytest.fixture(autouse=True)
def _no_interpret(monkeypatch):
    # interpret-mode pallas_calls lower as host callbacks, not Mosaic —
    # force the real lowering regardless of what other tests toggled
    monkeypatch.setattr(qm, "INTERPRET", False)
    monkeypatch.setattr(fa, "INTERPRET", False)


def lower_for_tpu(fn, *args):
    """AOT-lower fn for the TPU platform on the host; no device needed."""
    jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


# --- quantized matmul kernels -------------------------------------------

K, N, M, GROUP = 512, 256, 64, 128
G_COUNT = K // GROUP


def test_grouped_matmul_lowers():
    x = jnp.ones((M, K), jnp.bfloat16)
    kq = jnp.ones((K, N), jnp.int8)
    sg = jnp.ones((G_COUNT, N), jnp.float32)
    assert qm.pallas_supported(x, kq, sg)
    lower_for_tpu(
        lambda a, b, c: qm.grouped_matmul_pallas(a, b, c, interpret=False),
        x, kq, sg)


def test_quant_dx_lowers():
    g = jnp.ones((M, N), jnp.bfloat16)
    kq = jnp.ones((K, N), jnp.int8)
    sg = jnp.ones((G_COUNT, N), jnp.float32)
    assert qm.dx_pallas_supported(g, kq, sg)
    lower_for_tpu(
        lambda a, b, c: qm.quant_dx_pallas(a, b, c, interpret=False),
        g, kq, sg)


def test_per_channel_dx_escape_hatch_lowers(monkeypatch):
    """FLIPPED_DX_PALLAS_PER_CHANNEL=1 routes the per-channel int8 backward
    through the grouped dx kernel with broadcast scale groups
    (model/int8.py:64-78, default off) — the env-gated route must keep
    Mosaic-lowering, not just interpret-mode, coverage."""
    from flipped_tpu.model.int8 import _bwd
    monkeypatch.setenv("FLIPPED_DX_PALLAS_PER_CHANNEL", "1")
    g = jnp.ones((M, N), jnp.bfloat16)
    kq = jnp.ones((K, N), jnp.int8)
    scale = jnp.ones((N,), jnp.float32)
    lower_for_tpu(lambda a, b, c: _bwd((b, c), a)[0], g, kq, scale)


@pytest.mark.parametrize("act_quant", [True, False])
def test_int4_matmul_lowers(act_quant):
    x = jnp.ones((M, K), jnp.bfloat16)
    kq4 = jnp.ones((K, N // 2), jnp.int8)
    sg = jnp.ones((G_COUNT, N), jnp.float32)
    assert qm.int4_pallas_supported(x, kq4, sg)
    lower_for_tpu(
        lambda a, b, c: qm.int4_matmul_grouped_pallas(
            a, b, c, interpret=False, act_quant=act_quant),
        x, kq4, sg)


def test_int4_dx_lowers():
    g = jnp.ones((M, N), jnp.bfloat16)
    kq4 = jnp.ones((K, N // 2), jnp.int8)
    sg = jnp.ones((G_COUNT, N), jnp.float32)
    lower_for_tpu(
        lambda a, b, c: qm.int4_dx_pallas(a, b, c, interpret=False),
        g, kq4, sg)


# --- flash attention kernels --------------------------------------------

B, S, H, DH, MAX_FEATS = 2, 256, 4, 128, 10


def _qkvg():
    q = jnp.ones((B, S, H, DH), jnp.bfloat16)
    gate2 = jnp.ones((H,), jnp.float32)
    vs = jnp.full((B,), 3, jnp.int32)
    return q, q, q, gate2, vs


def test_flash_fwd_lowers():
    q, k, v, gate2, vs = _qkvg()
    lower_for_tpu(
        lambda *a: fa.flash_text_attention(*a, MAX_FEATS, interpret=False),
        q, k, v, gate2, vs)


def test_flash_bwd_lowers():
    q, k, v, gate2, vs = _qkvg()
    lower_for_tpu(
        lambda *a: fa.flash_text_attention_bwd(
            a[0], a[1], a[2], a[3], a[4], MAX_FEATS, a[5], interpret=False),
        q, k, v, gate2, vs, q)


@pytest.mark.parametrize("with_offset", [False, True])
def test_flash_streaming_fwd_lowers(with_offset):
    q, k, v, gate2, vs = _qkvg()
    off = (jnp.int32(S),) if with_offset else ()
    kk = jnp.ones((B, 2 * S, H, DH), jnp.bfloat16) if with_offset else k
    lower_for_tpu(
        lambda *a: fa.flash_streaming_fwd(
            a[0], a[1], a[2], a[3], a[4], MAX_FEATS, interpret=False,
            q_offset=(a[5] if with_offset else None)),
        q, kk, kk, gate2, vs, *off)


@pytest.mark.parametrize("with_offset", [False, True])
def test_flash_streaming_bwd_lowers(with_offset):
    q, k, v, gate2, vs = _qkvg()
    off = (jnp.int32(S),) if with_offset else ()
    kk = jnp.ones((B, 2 * S, H, DH), jnp.bfloat16) if with_offset else k
    lower_for_tpu(
        lambda *a: fa.flash_streaming_bwd(
            a[0], a[1], a[2], a[3], a[4], MAX_FEATS, a[5], interpret=False,
            q_offset=(a[6] if with_offset else None)),
        q, kk, kk, gate2, vs, q, *off)


def test_full_custom_vjp_train_path_lowers():
    """The composed custom-VJP attention (adapter prefix + Pallas text
    segment), forward AND backward, as the train step uses it."""
    q, k, v, gate2, vs = _qkvg()
    ak = jnp.ones((MAX_FEATS, H, DH), jnp.bfloat16)
    gate1 = jnp.ones((H,), jnp.float32)

    def loss(*a):
        # the custom_vjp primitive directly: flash_adapter_attention's
        # public wrapper falls back to einsum off-TPU and would skip Mosaic
        out = fa._flash_adapter_attention(a[0], a[1], a[2], a[3], a[4],
                                          a[5], a[6], a[7], MAX_FEATS)
        return jnp.sum(out.astype(jnp.float32))

    lower_for_tpu(jax.grad(loss, argnums=(0, 3, 5, 6)),
                  q, k, v, ak, ak, gate1, gate2, vs)


def test_dgrad_fused_lowers(monkeypatch):
    """Fused w8a8d dgrad kernel: the in-kernel SR dither (uint32 hash
    mixing, bitcasts, iota arithmetic) plus the int8 (1,1)-contraction dot
    must all pass Mosaic lowering — bench-shaped dims (7B wo matmul slice,
    multi-chunk quantize exercised via the ffn dim separately)."""
    g = jnp.ones((8, 384, 4096), jnp.bfloat16)     # (rows, S, N) cotangent
    kq = jnp.ones((4096, 4096), jnp.int8)
    sc = jnp.ones((4096,), jnp.float32)
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "1")  # opt-in since r05
    assert qm.dgrad_pallas_supported(g, kq)
    lower_for_tpu(
        lambda a, b, c: qm.int8_dgrad_pallas(a, b, c, interpret=False),
        g, kq, sc)


def test_dgrad_fused_lowers_ffn_chunked(monkeypatch):
    """The 7B ffn contraction (N=11008 → two 5504-lane quantize chunks)."""
    g = jnp.ones((4, 128, 11008), jnp.bfloat16)
    kq = jnp.ones((4096, 11008), jnp.int8)
    sc = jnp.ones((11008,), jnp.float32)
    assert qm._dgrad_chunks(11008) == 2
    monkeypatch.setenv("FLIPPED_DGRAD_PALLAS", "1")  # opt-in since r05
    assert qm.dgrad_pallas_supported(g, kq)
    lower_for_tpu(
        lambda a, b, c: qm.int8_dgrad_pallas(a, b, c, interpret=False),
        g, kq, sc)


def test_fwd_fused_lowers(monkeypatch):
    """Fused per-channel w8a8 forward kernel at bench-shaped dims,
    including the chunked-K quantize (7B w2: K=11008). Opt-in since r05
    (measured slower than XLA — fwd_pallas_supported docstring), but the
    escape hatch must keep lowering."""
    monkeypatch.setenv("FLIPPED_FWD_PALLAS", "1")
    for (k, n) in [(4096, 4096), (11008, 4096)]:
        x = jnp.ones((8, 128, k), jnp.bfloat16)
        kq = jnp.ones((k, n), jnp.int8)
        sc = jnp.ones((n,), jnp.float32)
        assert qm.fwd_pallas_supported(x, kq)
        lower_for_tpu(
            lambda a, b, c: qm.int8_fwd_pallas(a, b, c, interpret=False),
            x, kq, sc)
