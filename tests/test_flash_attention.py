"""Pallas flash-attention kernel parity vs the exact einsum path
(interpret mode on CPU; the same kernel compiles on TPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.model.attention import adapter_gated_attention
from flipped_tpu.model.pallas.flash_attention import (_adapter_segment,
                                                      flash_text_attention)


def _rand_case(b=2, s=24, h=4, dh=8, al=5, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda *shape: jnp.array(rs.randn(*shape).astype(np.float32))
    return dict(q=mk(b, s, h, dh), k=mk(b, s, h, dh), v=mk(b, s, h, dh),
                ak=mk(al, h, dh), av=mk(al, h, dh), g1=mk(h), g2=mk(h))


@pytest.mark.parametrize("vs_values", [(4, 7), (-1, -1), (0, -1)])
def test_flash_matches_einsum(vs_values):
    c = _rand_case()
    b, s, h, dh = c["q"].shape
    vs = jnp.array(vs_values, jnp.int32)
    max_feats = 3

    ref = adapter_gated_attention(c["q"], c["k"], c["v"], c["ak"], c["av"],
                                  c["g1"], c["g2"], vs, max_feats)

    text = flash_text_attention(c["q"], c["k"], c["v"], c["g2"], vs,
                                max_feats, interpret=True)
    ada = _adapter_segment(c["q"], c["ak"], c["av"], c["g1"])
    ours = (text + ada).reshape(b, s, h * dh)

    # kernel computes matmuls in bf16 → tolerance at bf16 resolution
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_flash_nonmultiple_seq_len():
    """S not a multiple of the 128 block: padding keys must be masked."""
    c = _rand_case(b=1, s=150, h=2, dh=8, seed=1)
    vs = jnp.array([9], jnp.int32)
    ref = adapter_gated_attention(c["q"], c["k"], c["v"], c["ak"], c["av"],
                                  c["g1"], c["g2"], vs, 10)
    text = flash_text_attention(c["q"], c["k"], c["v"], c["g2"], vs, 10,
                                interpret=True)
    ada = _adapter_segment(c["q"], c["ak"], c["av"], c["g1"])
    ours = (text + ada).reshape(1, 150, -1)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pallas_backward_matches_einsum_grads():
    """The full custom_vjp (Pallas fwd + Pallas bwd for the text segment +
    exact adapter vjp) must match autodiff through the einsum formulation."""
    import flipped_tpu.model.pallas.flash_attention as fa

    c = _rand_case(b=2, s=20, h=2, dh=8, al=3, seed=7)
    vs = jnp.array([4, -1], jnp.int32)  # one gated row, one qav-style row
    mf = 3

    def loss_ref(q, k, v, ak, av, g1, g2):
        out = adapter_gated_attention(q, k, v, ak, av, g1, g2, vs, mf)
        return jnp.sum(out * jnp.cos(out))

    def loss_flash(q, k, v, ak, av, g1, g2):
        out = fa._flash_adapter_attention(q, k, v, ak, av, g1, g2, vs, mf)
        return jnp.sum(out * jnp.cos(out))

    args = (c["q"], c["k"], c["v"], c["ak"], c["av"], c["g1"], c["g2"])
    ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        got = jax.grad(loss_flash, argnums=tuple(range(7)))(*args)
    finally:
        fa.INTERPRET = old
    names = ["dq", "dk", "dv", "dak", "dav", "dg1", "dg2"]
    for n, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=4e-2,
                                   atol=4e-2, err_msg=n)


def test_flash_gradients_flow():
    """The custom_vjp (Pallas fwd+bwd, interpret mode) produces finite grads
    for all differentiable inputs including the gates."""
    import flipped_tpu.model.pallas.flash_attention as fa

    c = _rand_case(b=1, s=16, h=2, dh=8, al=3, seed=2)
    vs = jnp.array([2], jnp.int32)

    def loss(q, k, v, ak, av, g1, g2):
        out = fa._flash_adapter_attention(q, k, v, ak, av, g1, g2, vs, 3)
        return jnp.sum(out ** 2)

    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
            c["q"], c["k"], c["v"], c["ak"], c["av"], c["g1"], c["g2"])
    finally:
        fa.INTERPRET = old
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # gate2 grad is nonzero only when a video block exists
    assert float(jnp.abs(grads[6]).sum()) > 0


# ---------------------------------------------------------------------------
# streaming (K-blocked online-softmax) kernels — no sequence bound
# (round-2 verdict, missing #3; SURVEY §5: the rebuild exists to remove the
# reference's O(S²) materialization, llama/model.py:299-300)
# ---------------------------------------------------------------------------

def _text_ref(q, k, v, g2, vs, mf):
    """Dense f32 text-segment reference (segment B of the einsum path)."""
    from flipped_tpu.model.attention import NEG_INF, video_block_bias

    b, s, h, dh = q.shape
    scores = jnp.einsum("bshd,bthd->bhst", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    causal = jnp.tril(jnp.ones((s, s), bool))
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    scores = scores + video_block_bias(vs, s, mf, g2.astype(jnp.float32))
    p = jax.nn.softmax(scores.astype(jnp.float32), -1)
    return jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))


def _text_ref_rows(q, k, v, g2, vs, mf, rows):
    """Row-sliced exact reference: attention output for selected query rows
    only — O(R·S) memory, so 8k-token rows stay testable on a small host
    (causality makes each row independent of later rows)."""
    b, s, h, dh = q.shape
    qs = q[:, rows]                                   # (B, R, H, Dh)
    scores = jnp.einsum("brhd,bshd->bhrs", qs, k,
                        preferred_element_type=jnp.float32) / np.sqrt(dh)
    col = jnp.arange(s)[None, :]
    rowv = jnp.asarray(rows)[:, None]
    vsb = vs[:, None, None]                           # (B, 1, 1)
    block = ((rowv[None] >= vsb + mf) & (col[None] >= vsb)
             & (col[None] < vsb + mf) & (vsb >= 0))   # (B, R, S)
    scores = scores + (block[:, None] * g2.astype(jnp.float32)[None, :, None, None])
    valid = col <= rowv
    scores = jnp.where(valid[None, None], scores, -1e30)
    p = jax.nn.softmax(scores.astype(jnp.float32), -1)
    return jnp.einsum("bhrs,bshd->brhd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("vs_values", [(9, -1), (0, 40)])
def test_streaming_fwd_small_nonmultiple(vs_values):
    """Streaming fwd at S=150 with 128-blocks: padding, masking, and the
    gate2 block must match the dense reference."""
    from flipped_tpu.model.pallas.flash_attention import flash_streaming_fwd

    c = _rand_case(b=2, s=150, h=2, dh=8, seed=3)
    vs = jnp.array(vs_values, jnp.int32)
    out, lse = flash_streaming_fwd(c["q"], c["k"], c["v"], c["g2"], vs, 10,
                                   block=128, interpret=True)
    ref = _text_ref(c["q"], c["k"], c["v"], c["g2"], vs, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert np.isfinite(np.asarray(lse)[:, :, :150]).all()


def test_streaming_dispatch_full_vjp(monkeypatch):
    """With the dispatch thresholds forced low, the full custom_vjp routes
    through the streaming fwd + saved-lse streaming bwd and must still match
    autodiff through the einsum formulation (all grads incl. gates)."""
    import flipped_tpu.model.pallas.flash_attention as fa

    monkeypatch.setattr(fa, "MAX_SEQ_FWD", 16)
    monkeypatch.setattr(fa, "MAX_SEQ_BWD", 16)
    # S=600 > one 512-block → a genuinely multi-block (2×2) streaming grid
    c = _rand_case(b=2, s=600, h=2, dh=8, al=3, seed=9)
    vs = jnp.array([37, -1], jnp.int32)
    mf = 10

    def loss_ref(q, k, v, ak, av, g1, g2):
        out = adapter_gated_attention(q, k, v, ak, av, g1, g2, vs, mf)
        return jnp.sum(out * jnp.cos(out))

    def loss_flash(q, k, v, ak, av, g1, g2):
        out = fa._flash_adapter_attention(q, k, v, ak, av, g1, g2, vs, mf)
        return jnp.sum(out * jnp.cos(out))

    args = (c["q"], c["k"], c["v"], c["ak"], c["av"], c["g1"], c["g2"])
    ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    monkeypatch.setattr(fa, "INTERPRET", True)
    got = jax.grad(loss_flash, argnums=tuple(range(7)))(*args)
    names = ["dq", "dk", "dv", "dak", "dav", "dg1", "dg2"]
    for n, r, g in zip(names, ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=4e-2,
                                   atol=4e-2, err_msg=n)


def test_streaming_parity_1k():
    """S=1024 multi-block fwd + bwd vs the dense f32 reference."""
    from flipped_tpu.model.pallas.flash_attention import (
        flash_streaming_bwd, flash_streaming_fwd)

    c = _rand_case(b=1, s=1024, h=2, dh=64, seed=4)
    vs = jnp.array([57], jnp.int32)
    mf = 10
    out, lse = flash_streaming_fwd(c["q"], c["k"], c["v"], c["g2"], vs, mf,
                                   block=256, interpret=True)
    ref = _text_ref(c["q"], c["k"], c["v"], c["g2"], vs, mf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    rs = np.random.RandomState(5)
    w = jnp.array(rs.randn(*out.shape).astype(np.float32))

    def loss(q, k, v, g2):
        return jnp.sum(_text_ref(q, k, v, g2, vs, mf) * w)

    dq_r, dk_r, dv_r, dg2_r = jax.grad(loss, argnums=(0, 1, 2, 3))(
        c["q"], c["k"], c["v"], c["g2"])
    dq, dk, dv, dg2 = flash_streaming_bwd(
        c["q"], c["k"], c["v"], c["g2"], vs, mf, w.astype(c["q"].dtype),
        o_text=out, lse=lse, block=256, interpret=True)
    for n, r, g in (("dq", dq_r, dq), ("dk", dk_r, dk), ("dv", dv_r, dv),
                    ("dg2", dg2_r, dg2)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=4e-2,
                                   atol=4e-2, err_msg=n)


@pytest.mark.parametrize("s", [4096, 8192])
def test_streaming_parity_long(s):
    """S ∈ {4k, 8k}: fwd parity on row slices spread across the sequence
    (exact via causal row-independence) and bwd parity under a row-sparse
    cotangent (keeps the reference O(R·S) so an 8k check runs on CPU)."""
    from flipped_tpu.model.pallas.flash_attention import (
        flash_streaming_bwd, flash_streaming_fwd)

    c = _rand_case(b=1, s=s, h=1, dh=64, seed=6)
    vs = jnp.array([33], jnp.int32)
    mf = 10
    rows = [0, 32, 43, 511, 512, 2047, 2048, s - 513, s - 1]

    out, lse = flash_streaming_fwd(c["q"], c["k"], c["v"], c["g2"], vs, mf,
                                   block=512, interpret=True)
    ref_rows = _text_ref_rows(c["q"], c["k"], c["v"], c["g2"], vs, mf, rows)
    np.testing.assert_allclose(np.asarray(out[:, rows]),
                               np.asarray(ref_rows), rtol=2e-2, atol=2e-2)

    # row-sparse cotangent: dk/dv/dg2 receive contributions from the chosen
    # rows across ALL their keys — long-range blocking is exercised exactly
    rs = np.random.RandomState(8)
    w = jnp.array(rs.randn(*ref_rows.shape).astype(np.float32))

    def loss(q, k, v, g2):
        return jnp.sum(_text_ref_rows(q, k, v, g2, vs, mf, rows) * w)

    dq_r, dk_r, dv_r, dg2_r = jax.grad(loss, argnums=(0, 1, 2, 3))(
        c["q"], c["k"], c["v"], c["g2"])
    g4 = jnp.zeros_like(c["q"]).at[:, rows].set(w.astype(c["q"].dtype))
    dq, dk, dv, dg2 = flash_streaming_bwd(
        c["q"], c["k"], c["v"], c["g2"], vs, mf, g4,
        o_text=out, lse=lse, block=512, interpret=True)
    for n, r, g in (("dq", dq_r, dq), ("dk", dk_r, dk), ("dv", dv_r, dv),
                    ("dg2", dg2_r, dg2)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=4e-2,
                                   atol=4e-2, err_msg=n)


def test_wrappers_dispatch_beyond_bounds(monkeypatch):
    """flash_text_attention / _bwd no longer hard-error past the single-pass
    VMEM design points — they dispatch to the streaming kernels."""
    import flipped_tpu.model.pallas.flash_attention as fa

    monkeypatch.setattr(fa, "MAX_SEQ_FWD", 64)
    monkeypatch.setattr(fa, "MAX_SEQ_BWD", 64)
    c = _rand_case(b=1, s=150, h=2, dh=8, seed=10)
    vs = jnp.array([9], jnp.int32)
    out = fa.flash_text_attention(c["q"], c["k"], c["v"], c["g2"], vs, 10,
                                  interpret=True)
    ref = _text_ref(c["q"], c["k"], c["v"], c["g2"], vs, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    g = jnp.ones_like(c["q"])
    dq, dk, dv, dg2 = fa.flash_text_attention_bwd(
        c["q"], c["k"], c["v"], c["g2"], vs, 10, g, interpret=True)
    assert np.isfinite(np.asarray(dq)).all()
    assert dg2.shape == (2,)


# --- q_offset (sequence-parallel) variants of the streaming kernels ---------

def _sp_case(b=2, s=256, h=4, dh=64, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(b, s, h, dh).astype(np.float32) * 0.3)
    q, k, v = mk(), mk(), mk()
    gate2 = jnp.asarray(rs.randn(h).astype(np.float32))
    vs = jnp.asarray(([3, -1] * b)[:b], jnp.int32)
    return q, k, v, gate2, vs


def test_streaming_fwd_q_offset_matches_full():
    """flash_streaming_fwd on a q SHARD with q_offset ≡ the matching slice
    of the full-q run — the sequence-parallel contract."""
    from flipped_tpu.model.pallas.flash_attention import flash_streaming_fwd
    q, k, v, gate2, vs = _sp_case(s=256)
    full, _ = flash_streaming_fwd(q, k, v, gate2, vs, 10, block=128,
                                  interpret=True)
    for shard, n_shards in ((0, 2), (1, 2)):
        s_loc = q.shape[1] // n_shards
        q_loc = q[:, shard * s_loc:(shard + 1) * s_loc]
        got, _ = flash_streaming_fwd(q_loc, k, v, gate2, vs, 10, block=128,
                                     interpret=True,
                                     q_offset=jnp.int32(shard * s_loc))
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(full[:, shard * s_loc:(shard + 1) * s_loc]),
            rtol=2e-5, atol=2e-5)


def test_streaming_bwd_q_offset_shards_sum_to_full():
    """Sequence-parallel backward contract: per-shard dq slices concatenate
    to the full dq; per-shard PARTIAL dk/dv (full length) and dgate2 SUM to
    the full-run values."""
    from flipped_tpu.model.pallas.flash_attention import flash_streaming_bwd
    q, k, v, gate2, vs = _sp_case(s=256, seed=3)
    rs = np.random.RandomState(9)
    g = jnp.asarray(rs.randn(*q.shape).astype(np.float32) * 0.2)

    dq_f, dk_f, dv_f, dg2_f = flash_streaming_bwd(
        q, k, v, gate2, vs, 10, g, block=128, interpret=True)

    n_shards, s_loc = 2, q.shape[1] // 2
    dq_parts, dk_sum, dv_sum, dg2_sum = [], 0, 0, 0
    for i in range(n_shards):
        sl = slice(i * s_loc, (i + 1) * s_loc)
        dq_i, dk_i, dv_i, dg2_i = flash_streaming_bwd(
            q[:, sl], k, v, gate2, vs, 10, g[:, sl], block=128,
            interpret=True, q_offset=jnp.int32(i * s_loc))
        assert dq_i.shape == q[:, sl].shape
        assert dk_i.shape == k.shape            # full-length partial
        dq_parts.append(dq_i)
        dk_sum, dv_sum, dg2_sum = dk_sum + dk_i, dv_sum + dv_i, dg2_sum + dg2_i

    np.testing.assert_allclose(np.asarray(jnp.concatenate(dq_parts, axis=1)),
                               np.asarray(dq_f), rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk_sum), np.asarray(dk_f),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv_sum), np.asarray(dv_f),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dg2_sum), np.asarray(dg2_f),
                               rtol=2e-2, atol=2e-3)


def test_sp_flash_adapter_attention_matches_einsum_oracle():
    """sp_flash_adapter_attention on a dp2×sp2×tp2 virtual mesh ≡ the exact
    einsum path on one device — outputs AND all gradients (q/k/v, adapter
    k/v, gate1, gate2). Kernels run through the Pallas interpreter."""
    import flipped_tpu.model.pallas.flash_attention as fa
    from flipped_tpu.core.config import MeshConfig
    from flipped_tpu.core.mesh import make_mesh
    from flipped_tpu.model.attention import adapter_gated_attention
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=devs[:8])

    rs = np.random.RandomState(11)
    b, s, h, dh, al = 2, 256, 4, 64, 10
    mk = lambda *shape: jnp.asarray(rs.randn(*shape).astype(np.float32) * 0.3)
    q, k, v = mk(b, s, h, dh), mk(b, s, h, dh), mk(b, s, h, dh)
    ak, av = mk(al, h, dh), mk(al, h, dh)   # shared across batch
    g1, g2 = mk(h), mk(h)
    vs = jnp.asarray([3, -1], jnp.int32)

    args = (q, k, v, ak, av, g1, g2)

    def oracle(*a):
        return adapter_gated_attention(*a, vs, 10).astype(jnp.float32).sum()

    want = jax.grad(oracle, argnums=tuple(range(7)))(*args)
    want_out = adapter_gated_attention(*args, vs, 10)

    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            sh = lambda spec, x: jax.device_put(x, NamedSharding(mesh, spec))
            qs = sh(P("dp", "sp", "tp", None), q)
            ks = sh(P("dp", "sp", "tp", None), k)
            vss = sh(P("dp", "sp", "tp", None), v)
            aks = sh(P(None, "tp", None), ak)
            avs = sh(P(None, "tp", None), av)
            g1s, g2s = sh(P("tp"), g1), sh(P("tp"), g2)
            vstart = sh(P("dp"), vs)

            got_out = fa.sp_flash_adapter_attention(
                qs, ks, vss, aks, avs, g1s, g2s, vstart, 10)

            def f(*a):
                return fa.sp_flash_adapter_attention(
                    *a, vstart, 10).astype(jnp.float32).sum()

            got = jax.jit(jax.grad(f, argnums=tuple(range(7)))
                          )(qs, ks, vss, aks, avs, g1s, g2s)
            got = jax.tree_util.tree_map(np.asarray, got)
            got_out = np.asarray(got_out)
    finally:
        fa.INTERPRET = old

    np.testing.assert_allclose(got_out, np.asarray(want_out),
                               rtol=2e-2, atol=2e-3)
    names = ("dq", "dk", "dv", "dak", "dav", "dg1", "dg2")
    for n, a, w in zip(names, got, want):
        np.testing.assert_allclose(a, np.asarray(w), rtol=2e-2, atol=3e-3,
                                   err_msg=n)


def test_sp_dispatch_falls_back_on_indivisible_seq():
    """S % sp != 0 can't shard_map — sp_flash_or_einsum must fall back to
    the exact einsum path instead of crashing."""
    import flipped_tpu.model.pallas.flash_attention as fa
    from flipped_tpu.core.config import MeshConfig
    from flipped_tpu.core.mesh import make_mesh
    from flipped_tpu.model.attention import adapter_gated_attention

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = make_mesh(MeshConfig(dp=2, sp=2, tp=2), devices=devs[:8])
    rs = np.random.RandomState(13)
    b, s, h, dh, al = 2, 65, 4, 8, 4          # 65 % 2 != 0
    mk = lambda *shape: jnp.asarray(rs.randn(*shape).astype(np.float32))
    q, k, v = mk(b, s, h, dh), mk(b, s, h, dh), mk(b, s, h, dh)
    ak, av, g1, g2 = mk(al, h, dh), mk(al, h, dh), mk(h), mk(h)
    vs = jnp.asarray([3, -1], jnp.int32)

    old = fa.INTERPRET
    fa.INTERPRET = True
    try:
        with jax.set_mesh(mesh):
            with pytest.warns(UserWarning, match="einsum attention path"):
                got = fa.sp_flash_or_einsum(q, k, v, ak, av, g1, g2, vs, 4)
    finally:
        fa.INTERPRET = old
    want = adapter_gated_attention(q, k, v, ak, av, g1, g2, vs, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
