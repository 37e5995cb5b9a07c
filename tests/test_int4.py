"""Packed int4 weight quantization (--quantize int4|w4a8, model/int4.py).

The reference runs the whole backbone in fp16 (llama_vqa.py:63-65); 4-bit
frozen weights are an addition targeting the 16 GB v5e capacity walls
(docs/PERF.md) in the QLoRA regime this model already lives in (frozen
backbone + f32 adapters)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.ckpt.quantize import (dequantize_kernel, quantize_frozen,
                                       quantize_kernel, randomize_quantized)
from flipped_tpu.core.config import ModelConfig, quant_flags
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.model.int4 import (int4_matmul, int4_matmul_grouped,
                                    pack_int4, unpack_int4, unpack_int4_np)
from flipped_tpu.train import merge_params, partition_params

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                  multiple_of=16, max_seq_len=48, adapter_len=4,
                  adapter_layer=2, max_feats=4, visual_dim=16)


def test_pack_unpack_roundtrip():
    rs = np.random.RandomState(0)
    q = rs.randint(-8, 8, (16, 10)).astype(np.int8)
    packed = pack_int4(q)
    assert packed.shape == (16, 5) and packed.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4_np(packed), q)
    # the jnp unpack (arithmetic shifts on int8) agrees with the numpy one
    np.testing.assert_array_equal(np.asarray(unpack_int4(jnp.asarray(packed))),
                                  q)


def test_pack_rejects_odd_output_dim():
    with pytest.raises(ValueError):
        pack_int4(np.zeros((4, 5), np.int8))


def test_quantize_kernel_bits4_roundtrip_error():
    rs = np.random.RandomState(1)
    k = rs.randn(256, 64).astype(np.float32) * 0.05
    node = quantize_kernel(k, group=128, bits=4)
    assert set(node) == {"kernel_q4", "scale"}
    assert node["kernel_q4"].shape == (256, 32)
    assert node["scale"].shape == (2, 64)            # K/group groups
    deq = dequantize_kernel(node)
    # symmetric ±7 grouped absmax: error ≤ scale/2 per element... except the
    # clip at ±7 loses nothing (scale = absmax/7 ⇒ |q| ≤ 7 exactly)
    scale = np.asarray(node["scale"], np.float32)
    bound = np.repeat(scale, 128, axis=0) * 0.5 + 1e-7
    assert (np.abs(deq - k) <= bound).all()


def test_quantize_kernel_bits4_group_fallback():
    """group that doesn't divide K falls back to one group (tiny configs)."""
    k = np.random.RandomState(2).randn(48, 16).astype(np.float32)
    node = quantize_kernel(k, group=128, bits=4)
    assert node["scale"].shape == (1, 16)


def test_bits4_rejects_outlier_passthrough():
    with pytest.raises(ValueError):
        quantize_kernel(np.zeros((64, 16), np.float32), group=0, outliers=4,
                        bits=4)


def test_int4_matmul_matches_dequant_reference():
    rs = np.random.RandomState(3)
    k = rs.randn(256, 64).astype(np.float32) * 0.05
    node = quantize_kernel(k, group=128, bits=4)
    x = jnp.asarray(rs.randn(8, 256).astype(np.float32))
    got = int4_matmul(x, node["kernel_q4"], node["scale"])
    # exact vs the module's own bf16 dequant path...
    from flipped_tpu.model.int4 import _dequant_bf16
    w = _dequant_bf16(node["kernel_q4"], node["scale"]).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x @ w))
    # ...and numerically close to the f32 dequant oracle (bf16 rounding only)
    want = x @ jnp.asarray(dequantize_kernel(node))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=1e-2)


def test_w4a8_matmul_matches_grouped_int8_on_unpacked():
    """int4_matmul_grouped ≡ the grouped w8a8 oracle on the unpacked ints —
    the activation-quantization semantics are shared verbatim."""
    from flipped_tpu.model.int8 import _grouped_matmul_impl
    rs = np.random.RandomState(4)
    k = rs.randn(256, 64).astype(np.float32) * 0.05
    node = quantize_kernel(k, group=128, bits=4)
    x = jnp.asarray(rs.randn(8, 256).astype(np.float32))
    got = int4_matmul_grouped(x, node["kernel_q4"], node["scale"])
    want = _grouped_matmul_impl(x, unpack_int4(node["kernel_q4"]),
                                node["scale"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("fn", [int4_matmul, int4_matmul_grouped])
def test_int4_gradients_are_dequant_exact(fn):
    """Both custom VJPs return dx = g @ dequant(W)ᵀ in bf16 — and keep only
    the PACKED weights as residuals."""
    rs = np.random.RandomState(5)
    k = rs.randn(256, 64).astype(np.float32) * 0.05
    node = quantize_kernel(k, group=128, bits=4)
    x = jnp.asarray(rs.randn(4, 256).astype(np.float32))
    g = jnp.asarray(rs.randn(4, 64).astype(np.float32))

    dx = jax.vjp(lambda xx: fn(xx, node["kernel_q4"], node["scale"]), x
                 )[1](g)[0]
    from flipped_tpu.model.int4 import _dequant_bf16
    w = _dequant_bf16(node["kernel_q4"], node["scale"])
    want = (g.astype(jnp.bfloat16) @ w.T).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(want))


def _init_partitioned(model):
    rng = jax.random.PRNGKey(1)
    tokens = jax.random.randint(rng, (2, 24), 0, CFG.vocab_size)
    video = jax.random.normal(rng, (2, 4, 16)) * 0.5
    vs = jnp.full((2,), 3, jnp.int32)
    splice = vs[:, None] + jnp.arange(4)[None]
    params = model.init(rng, tokens, video, None, vs, splice)["params"]
    return params, (tokens, video, vs, splice)


def test_quantize_frozen_bits4_structure_and_size():
    model = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32)
    params, _ = _init_partitioned(model)
    _, frozen = partition_params(params)
    q4 = quantize_frozen(frozen, group=128, bits=4)
    att = q4["layers_0"]["attention"]["wq"]
    assert set(att) == {"kernel_q4", "scale"}
    assert att["kernel_q4"].shape == (32, 16)        # packed along N
    # the LM head stays int8 (its logits feed the eval argmin directly)
    assert "kernel_q" in q4["output"] and "kernel_q4" not in q4["output"]
    # packed block weights are half the int8 bytes
    q8 = quantize_frozen(frozen, group=128)
    assert (att["kernel_q4"].nbytes
            == q8["layers_0"]["attention"]["wq"]["kernel_q"].nbytes // 2)


def test_int4_model_forward_close_to_full():
    full = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32)
    params, (tokens, video, vs, splice) = _init_partitioned(full)
    trainable, frozen = partition_params(params)

    for mode in ("int4", "w4a8"):
        quant = FlippedVQAModel(CFG, dtype=jnp.float32,
                                frozen_dtype=jnp.float32,
                                **quant_flags(mode))
        qparams = merge_params(trainable,
                               quantize_frozen(frozen, group=128, bits=4))
        logits_f, _ = full.apply({"params": params}, tokens, video, None,
                                 vs, splice)
        logits_q, _ = quant.apply({"params": qparams}, tokens, video, None,
                                  vs, splice)
        denom = np.abs(np.asarray(logits_f)).max()
        rel = np.abs(np.asarray(logits_q) - np.asarray(logits_f)).max() / denom
        # 4-bit: looser envelope than int8's 0.05, still recognizably the
        # same function
        assert rel < 0.15, (mode, rel)
        agree = (np.asarray(logits_f).argmax(-1)
                 == np.asarray(logits_q).argmax(-1)).mean()
        assert agree > 0.8, (mode, agree)


def test_int4_param_structure_matches_quantize_frozen():
    """Model-initialized int4 params line up leaf-for-leaf with what
    quantize_frozen(bits=4) produces — the builder grafts one into the
    other."""
    quant = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            **quant_flags("w4a8"))
    qparams, _ = _init_partitioned(quant)
    _, qfrozen = partition_params(qparams)

    full = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32)
    params, _ = _init_partitioned(full)
    _, frozen = partition_params(params)
    ref = quantize_frozen(frozen, group=128, bits=4)

    got = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), qfrozen)
    want = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), ref)
    assert got == want


def test_randomize_quantized_fills_int4():
    quant = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            **quant_flags("w4a8"))
    qparams, (tokens, video, vs, splice) = _init_partitioned(quant)
    _, qfrozen = partition_params(qparams)
    filled = randomize_quantized(qfrozen, seed=0)
    kq4 = np.asarray(filled["layers_0"]["attention"]["wq"]["kernel_q4"])
    vals = unpack_int4_np(kq4)
    assert np.abs(vals).max() <= 7 and np.std(vals.astype(np.float32)) > 1.0
    trainable, _ = partition_params(qparams)
    logits, _ = quant.apply({"params": merge_params(trainable, filled)},
                            tokens, video, None, vs, splice)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_losses_and_grads_through_int4_backbone():
    """Adapter gradients flow through the packed backbone, losses are finite
    and close to the weight-only int8 losses — the QLoRA training setting."""
    from flipped_tpu.data import make_synthetic_items, pack_train_batch
    from flipped_tpu.text import MockTokenizer
    from flipped_tpu.train import compute_objective_losses

    cfg = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=512,
                      multiple_of=16, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    int4 = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                           **quant_flags("int4"))
    w4a8 = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                           **quant_flags("w4a8"))
    items = make_synthetic_items(tok, 2, max_feats=4, max_seq_len=96,
                                 visual_dim=16, seed=11)
    batch = {k: jnp.array(v) for k, v in
             pack_train_batch(items, 4).items()}
    params = int4.init(jax.random.PRNGKey(2), batch["vqa_tokens"],
                       batch["video"], None, batch["vqa_video_start"],
                       batch["vqa_splice"])["params"]
    trainable, frozen = partition_params(params)
    frozen = randomize_quantized(frozen, seed=3)

    def loss_fn(model, t):
        p = merge_params(t, frozen)
        return compute_objective_losses(model, {"params": p}, batch,
                                        vaq=True, qav=True).total

    l_w = float(loss_fn(int4, trainable))
    l_a = float(loss_fn(w4a8, trainable))
    assert np.isfinite(l_w) and np.isfinite(l_a)
    assert abs(l_a - l_w) / abs(l_w) < 0.05, (l_a, l_w)

    g_a = jax.grad(lambda t: loss_fn(w4a8, t))(trainable)
    flat, _ = jax.tree_util.tree_flatten(g_a)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(np.abs(np.asarray(g)).sum()) for g in flat)
    assert total > 0


def test_builder_int4_rotated_checkpoint_build(tmp_path):
    """--quantize w4a8r through the real builder: export a tiny reference
    checkpoint, build, and check the composition landed — packed kernel_q4
    block leaves, int8 LM head, qav_rot present, and finite training losses."""
    from flipped_tpu.ckpt import export_reference_style
    from flipped_tpu.core.config import DataConfig, RunConfig, TrainConfig
    from flipped_tpu.data import make_synthetic_items, pack_train_batch
    from flipped_tpu.train import compute_objective_losses, merge_params
    from flipped_tpu.train.builder import build_train_state

    full = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32)
    params, _ = _init_partitioned(full)
    mdir = tmp_path / "tiny_i4"
    export_reference_style(
        params, 1, str(mdir),
        dict(dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
             norm_eps=CFG.norm_eps, vocab_size=CFG.vocab_size,
             multiple_of=CFG.multiple_of))

    run_cfg = RunConfig(
        model=ModelConfig(adapter_len=CFG.adapter_len,
                          adapter_layer=CFG.adapter_layer,
                          max_feats=CFG.max_feats, bias=CFG.bias,
                          tau=CFG.tau),
        data=DataConfig(max_seq_len=CFG.max_seq_len),
        train=TrainConfig(quantize="w4a8r", vaq=True, qav=True, remat=False),
        llama_model_path=str(tmp_path), model_name="tiny_i4")
    model, cfg, tok, trainable, frozen = build_train_state(run_cfg)

    wq = frozen["layers_0"]["attention"]["wq"]
    assert set(wq) == {"kernel_q4", "scale"}
    assert wq["kernel_q4"].shape == (cfg.dim, cfg.dim // 2)
    assert "kernel_q" in frozen["output"]            # head stays int8
    assert "qav_rot" in frozen                       # rotation fold landed

    items = make_synthetic_items(tok, 2, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="train",
                                 visual_dim=cfg.visual_dim, seed=1)
    batch = {k: jnp.array(v) for k, v in
             pack_train_batch(items, cfg.max_feats).items()}
    losses = compute_objective_losses(
        model, {"params": merge_params(trainable, frozen)}, batch,
        vaq=True, qav=True)
    assert np.isfinite(float(losses.total))


def test_int4_cuts_compiled_argument_bytes():
    """The reason int4 exists: XLA's own memory analysis of the compiled
    train step must show the frozen-argument footprint dropping by ~half
    the int8 block-kernel bytes (the capacity margin that unlocks batch-16
    no-remat and the 3-objective S=4096 stack, docs/PERF.md)."""
    from flipped_tpu.core.config import TrainConfig
    from flipped_tpu.data import (add_accum_axis, make_synthetic_items,
                                  pack_train_batch)
    from flipped_tpu.text import MockTokenizer
    from flipped_tpu.train import make_optimizer, make_train_step

    cfg = ModelConfig(dim=256, n_layers=2, n_heads=4, vocab_size=2048,
                      multiple_of=32, max_seq_len=96, adapter_len=4,
                      adapter_layer=2, max_feats=4, visual_dim=16)
    tok = MockTokenizer(cfg.vocab_size)
    items = make_synthetic_items(tok, 2, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len,
                                 visual_dim=cfg.visual_dim, seed=0)
    b = {k: jnp.array(v) for k, v in
         add_accum_axis(pack_train_batch(items, cfg.max_feats), 1).items()}
    tx = make_optimizer(TrainConfig(lr=1e-3), 10, 4)

    def arg_bytes(mode):
        model = FlippedVQAModel(cfg, **quant_flags(mode))
        params = model.init(jax.random.PRNGKey(0), b["vqa_tokens"][0],
                            b["video"][0], None, b["vqa_video_start"][0],
                            b["vqa_splice"][0])["params"]
        tr, fz = partition_params(params)
        fz = randomize_quantized(fz, seed=0)
        blocks = sum(
            leaf.nbytes for path, leaf in
            jax.tree_util.tree_leaves_with_path(fz)
            if "kernel_q" in jax.tree_util.keystr(path))
        step = make_train_step(model, tx, vaq=True, qav=True)
        ma = step.lower(tr, tx.init(tr), fz, b).compile().memory_analysis()
        return ma.argument_size_in_bytes, blocks

    a8, blocks8 = arg_bytes("w8a8g")       # grouped int8: same scale shapes
    a4, blocks4 = arg_bytes("w4a8")
    # packed leaves are half the int8 bytes (head excluded — stays int8)
    assert blocks4 < 0.75 * blocks8, (blocks4, blocks8)
    # and the compiled argument footprint drops by at least 80% of that
    assert a8 - a4 > 0.8 * (blocks8 - blocks4), (a8, a4, blocks8, blocks4)


def test_bits4_defaults_to_group_128():
    """quantize_kernel(bits=4) without an explicit group must use the same
    128-wide default as Linear — never a whole-K absmax window (review
    finding: the two defaulted differently)."""
    k = np.random.RandomState(7).randn(256, 64).astype(np.float32)
    node = quantize_kernel(k, bits=4)
    assert node["scale"].shape == (2, 64)
    frozen = {"layers_0": {"attention": {"wq": {"kernel": k}}},
              "output": {"kernel": k}}
    q = quantize_frozen(frozen, bits=4)
    assert q["layers_0"]["attention"]["wq"]["scale"].shape == (2, 64)
    # head stays int8 but picks up the same grouped scales the model expects
    assert q["output"]["kernel_q"].dtype == jnp.int8
    assert q["output"]["scale"].shape == (2, 64)


def test_xla_only_variants_match_pallas_dispatch():
    """int{8,4}_matmul_grouped_xla (used under sequence parallelism, where
    a pallas_call would force gathers) run a lax.scan over groups — only
    one (M, N) accumulator live instead of the batched dot's (G, M, N)
    intermediate — and agree with the dispatching variants to f32
    sum-order precision; gradients are bit-identical (shared backward)."""
    from flipped_tpu.model.int4 import int4_matmul_grouped_xla
    from flipped_tpu.model.int8 import (int8_matmul_grouped,
                                        int8_matmul_grouped_xla)
    rs = np.random.RandomState(8)
    k = rs.randn(256, 64).astype(np.float32) * 0.05
    x = jnp.asarray(rs.randn(4, 256).astype(np.float32))
    n4 = quantize_kernel(k, group=128, bits=4)
    np.testing.assert_allclose(
        np.asarray(int4_matmul_grouped_xla(x, n4["kernel_q4"], n4["scale"])),
        np.asarray(int4_matmul_grouped(x, n4["kernel_q4"], n4["scale"])),
        rtol=1e-6, atol=1e-6)
    n8 = quantize_kernel(k, group=128)
    np.testing.assert_allclose(
        np.asarray(int8_matmul_grouped_xla(x, n8["kernel_q"], n8["scale"])),
        np.asarray(int8_matmul_grouped(x, n8["kernel_q"], n8["scale"])),
        rtol=1e-6, atol=1e-6)
    # gradients flow through the XLA-only variants identically
    g4 = jax.grad(lambda xx: int4_matmul_grouped_xla(
        xx, n4["kernel_q4"], n4["scale"]).sum())(x)
    g4p = jax.grad(lambda xx: int4_matmul_grouped(
        xx, n4["kernel_q4"], n4["scale"]).sum())(x)
    np.testing.assert_array_equal(np.asarray(g4), np.asarray(g4p))


def test_scan_formulation_avoids_batched_intermediate():
    """The sequence-parallel XLA variants exist to kill the (G, M, N) f32
    intermediate: XLA's own memory analysis must show a much smaller temp
    footprint for the scan formulation."""
    from flipped_tpu.model.int8 import (_grouped_matmul_impl,
                                        _grouped_matmul_scan)
    rs = np.random.RandomState(9)
    k_dim, n, m, group = 1024, 1024, 2048, 128
    kq = jnp.asarray(rs.randint(-127, 128, (k_dim, n)).astype(np.int8))
    sg = jnp.asarray(rs.rand(k_dim // group, n).astype(np.float32))
    x = jax.ShapeDtypeStruct((m, k_dim), jnp.float32)

    def temps(fn):
        return jax.jit(fn).lower(x, kq, sg).compile(
            ).memory_analysis().temp_size_in_bytes

    batched, scan = temps(_grouped_matmul_impl), temps(_grouped_matmul_scan)
    # batched materializes (G, M, N) f32 = 64 MB here; scan keeps one (M, N)
    assert scan < 0.5 * batched, (batched, scan)
