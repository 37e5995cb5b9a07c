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


def test_seq_len_bounds_enforced():
    """The VMEM design bounds are enforced errors, not compile-time OOMs."""
    import flipped_tpu.model.pallas.flash_attention as fa

    s = fa.MAX_SEQ_BWD + 1
    q = jnp.zeros((1, s, 1, 8), jnp.float32)
    g2 = jnp.zeros((1,), jnp.float32)
    vs = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="exceeds the designed bound"):
        fa.flash_text_attention_bwd(q, q, q, g2, vs, 10, q)
    s = fa.MAX_SEQ_FWD + 1
    q = jnp.zeros((1, s, 1, 8), jnp.float32)
    with pytest.raises(ValueError, match="exceeds the designed bound"):
        fa.flash_text_attention(q, q, q, g2, vs, 10)
