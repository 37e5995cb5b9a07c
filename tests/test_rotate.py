"""Residual-stream rotation (ckpt/rotate.py): FWHT correctness, exact model
equivalence of the folded rotation, and the outlier-robustness property that
motivates --quantize int8r|w8a8r."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.ckpt.quantize import (dequantize_kernel, quantize_frozen,
                                       quantize_kernel)
from flipped_tpu.ckpt.rotate import Rotation, fwht, rotate_params
from flipped_tpu.core.config import ModelConfig, quant_flags
from flipped_tpu.data import make_synthetic_items, pack_train_batch
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.text import MockTokenizer
from flipped_tpu.train import compute_objective_losses, option_scores

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=512,
                  multiple_of=16, max_seq_len=96, adapter_len=4,
                  adapter_layer=2, max_feats=4, visual_dim=16, bias=3.0,
                  tau=100.0)


def _sylvester(d):
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < d:
        h = np.block([[h, h], [h, -h]])
    return h


def test_fwht_matches_explicit_hadamard():
    rs = np.random.RandomState(0)
    x = rs.randn(5, 16).astype(np.float32)
    h = _sylvester(16)
    np.testing.assert_allclose(fwht(x, axis=-1), x @ h, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(fwht(x.T, axis=0), h @ x.T, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("dim", [32, 24])  # FWHT branch and QR fallback
def test_rotation_matrix_orthogonal(dim):
    rot = Rotation(dim, seed=1)
    m = rot.matrix()
    np.testing.assert_allclose(m @ m.T, np.eye(dim), atol=1e-5)
    # one-sided folds agree with the explicit matrix
    rs = np.random.RandomState(2)
    k = rs.randn(dim, 7).astype(np.float32)
    g = rs.rand(dim).astype(np.float32) + 0.5
    np.testing.assert_allclose(rot.left_t(k, g), m.T @ (g[:, None] * k),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rot.right(k.T), k.T @ m, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rot.conjugate_diag(g),
                               m.T @ np.diag(g) @ m, rtol=1e-4, atol=1e-5)


def _tiny(seed=0, n=4):
    tok = MockTokenizer(CFG.vocab_size)
    model = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            trainable_dtype=jnp.float32)
    items = make_synthetic_items(tok, n, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="train",
                                 visual_dim=CFG.visual_dim, seed=seed)
    batch = pack_train_batch(items, CFG.max_feats)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.array(batch["vqa_tokens"]),
        jnp.array(batch["video"]), None,
        jnp.array(batch["vqa_video_start"]),
        jnp.array(batch["vqa_splice"]))["params"]
    # break the all-ones norm init — the fold must handle real γ
    rs = np.random.RandomState(seed + 7)

    def perturb(node, path=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in ("attention_norm", "ffn_norm") or (k == "norm"
                                                       and path == ""):
                w = np.asarray(v["weight"])
                out[k] = {"weight": jnp.asarray(
                    (rs.rand(*w.shape) + 0.5).astype(w.dtype))}
            else:
                out[k] = perturb(v, f"{path}/{k}")
        return out

    return model, perturb(params), batch


def test_rotated_model_exactly_equivalent():
    """Folded rotation must be a pure reparametrization: identical training
    losses (all three objectives — QAV exercises qav_rot) and identical
    eval option scores on the same inputs."""
    model, params, batch = _tiny()
    jbatch = {k: jnp.array(v) for k, v in batch.items()}
    base = compute_objective_losses(model, {"params": params}, jbatch,
                                    vaq=True, qav=True)

    rparams = rotate_params(params, CFG.n_layers, CFG.adapter_layer, seed=3)
    rmodel = FlippedVQAModel(CFG, dtype=jnp.float32,
                             frozen_dtype=jnp.float32,
                             trainable_dtype=jnp.float32, rotated=True)
    rot = compute_objective_losses(rmodel, {"params": rparams}, jbatch,
                                   vaq=True, qav=True)
    np.testing.assert_allclose(float(rot.vqa), float(base.vqa), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(float(rot.vaq), float(base.vaq), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(float(rot.qav), float(base.qav), rtol=2e-5,
                               atol=1e-5)

    # eval scores (dense scorer drives the argmin decision rule)
    tok = MockTokenizer(CFG.vocab_size)
    from flipped_tpu.data import pack_eval_batch
    items = make_synthetic_items(tok, 4, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="val",
                                 visual_dim=CFG.visual_dim, seed=5)
    ebatch = {k: jnp.array(v) for k, v in
              pack_eval_batch(items, CFG.max_feats).items()
              if np.asarray(v).dtype.kind in "biuf"}
    s_base = option_scores(model, {"params": params}, ebatch)
    s_rot = option_scores(rmodel, {"params": rparams}, ebatch)
    np.testing.assert_allclose(np.asarray(s_rot), np.asarray(s_base),
                               rtol=1e-4, atol=1e-4)

    # prefix-shared cached scorer (prefill + chunk-extend seam)
    from flipped_tpu.train import option_scores_cached
    c_base = option_scores_cached(model, {"params": params}, ebatch, 16)
    c_rot = option_scores_cached(rmodel, {"params": rparams}, ebatch, 16)
    np.testing.assert_allclose(np.asarray(c_rot), np.asarray(c_base),
                               rtol=1e-4, atol=1e-4)

    # KV-cached greedy decode seam (prefill + decode_step + output head)
    def decode_logits(m, p):
        vf = m.apply({"params": p}, ebatch["video"], None, method="fuse")
        toks = ebatch["vqa_tokens"][:, 0]
        s = toks.shape[1]
        h, ck, cv = m.apply({"params": p}, toks, vf,
                            ebatch["vqa_video_start"], ebatch["vqa_splice"],
                            s + 4, method="prefill")
        pos = jnp.full((toks.shape[0],), s - 1, jnp.int32)
        lg, _, _ = m.apply({"params": p}, toks[:, -1], ck, cv, pos,
                           ebatch["vqa_video_start"], method="decode_step")
        return np.asarray(lg, np.float32)

    np.testing.assert_allclose(decode_logits(rmodel, rparams),
                               decode_logits(model, params),
                               rtol=2e-4, atol=2e-4)


def test_rotation_fixes_outlier_quantization():
    """The property the scheme exists for: with amplified residual input
    channels, plain per-channel absmax int8 loses the small-signal
    precision; after rotation the SAME plain absmax recovers it."""
    rs = np.random.RandomState(0)
    d, n = 256, 128
    w = rs.randn(d, n).astype(np.float32) * 0.02
    w[rs.choice(d, 3, replace=False)] *= 30.0          # outlier input rows
    x = rs.randn(64, d).astype(np.float32)
    y_ref = x @ w

    rot = Rotation(d, seed=1)
    err_plain = np.linalg.norm(
        x @ dequantize_kernel(quantize_kernel(w)) - y_ref)
    xr = rot.right(x)                                   # x R
    wr = rot.left_t(w)                                  # Rᵀ W
    err_rot = np.linalg.norm(
        xr @ dequantize_kernel(quantize_kernel(wr)) - y_ref)
    scale = np.linalg.norm(y_ref)
    assert err_rot < err_plain / 3, (err_plain / scale, err_rot / scale)


def test_rotated_quantized_model_runs():
    """w8a8r end to end at tiny scale: rotate, quantize with PLAIN absmax,
    run the 3-objective step — finite losses close to the bf16 model's."""
    model, params, batch = _tiny(seed=2)
    jbatch = {k: jnp.array(v) for k, v in batch.items()}
    base = compute_objective_losses(model, {"params": params}, jbatch,
                                    vaq=True, qav=True)

    rparams = rotate_params(params, CFG.n_layers, CFG.adapter_layer, seed=4)
    from flipped_tpu.train import partition_params, merge_params
    trainable, frozen = partition_params(rparams)
    frozen_q = quantize_frozen(frozen)                 # plain scales
    flags = quant_flags("w8a8r")
    assert flags == {"quantized": True, "act_quant": True, "quant_group": 0,
                     "quant_outliers": False, "rotated": True,
                     "weight_bits": 8, "dgrad_quant": False}
    qmodel = FlippedVQAModel(CFG, dtype=jnp.float32,
                             frozen_dtype=jnp.float32,
                             trainable_dtype=jnp.float32, **flags)
    ql = compute_objective_losses(
        qmodel, {"params": merge_params(trainable, frozen_q)}, jbatch,
        vaq=True, qav=True)
    for name in ("vqa", "vaq", "qav"):
        b, q = float(getattr(base, name)), float(getattr(ql, name))
        assert np.isfinite(q), name
        assert abs(q - b) < 0.35 * max(abs(b), 1.0), (name, b, q)


def test_builder_rotated_checkpoint_build(tmp_path):
    """--quantize w8a8r through the real builder: export a tiny reference
    checkpoint (non-trivial norm γ), build, and check the fold landed —
    norm weights at 1, qav_rot ≠ I and f32, plain (out,) absmax scales,
    and one finite train step."""
    from flipped_tpu.ckpt import export_reference_style
    from flipped_tpu.core.config import (DataConfig, RunConfig,
                                         TrainConfig)
    from flipped_tpu.train import make_optimizer, make_train_step
    from flipped_tpu.train.builder import build_train_state

    _, params, _ = _tiny(seed=6)  # perturbed norms → non-trivial γ folds
    mdir = tmp_path / "tiny_rot"
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
        train=TrainConfig(quantize="w8a8r", vaq=True, qav=True, remat=False),
        llama_model_path=str(tmp_path), model_name="tiny_rot")
    model, cfg, tok, trainable, frozen = build_train_state(run_cfg)

    qr = np.asarray(frozen["qav_rot"])
    assert frozen["qav_rot"].dtype == jnp.float32          # cast-exempt
    assert np.abs(qr - np.eye(cfg.dim)).max() > 0.01       # γ folded in
    for i in range(cfg.n_layers):
        for nrm in ("attention_norm", "ffn_norm"):
            np.testing.assert_array_equal(
                np.asarray(frozen[f"layers_{i}"][nrm]["weight"],
                           np.float32), 1.0)
        assert frozen[f"layers_{i}"]["attention"]["wq"]["scale"].ndim == 1
    np.testing.assert_array_equal(
        np.asarray(frozen["norm"]["weight"], np.float32), 1.0)

    items = make_synthetic_items(tok, 2, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="train",
                                 visual_dim=cfg.visual_dim, seed=1)
    from flipped_tpu.data import add_accum_axis
    batch = {k: jnp.array(v) for k, v in
             add_accum_axis(pack_train_batch(items, cfg.max_feats),
                            1).items()}
    tx = make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=2,
                        world_batch=2)
    step = make_train_step(model, tx, vaq=True, qav=True)
    trainable, _, m = step(trainable, tx.init(trainable), frozen, batch)
    assert np.isfinite(float(m.loss))


def test_rotate_params_partial_tree_guards():
    model, params, _ = _tiny()
    broken = dict(params)
    broken.pop("norm")
    with pytest.raises(ValueError, match="norm.weight missing"):
        rotate_params(broken, CFG.n_layers, CFG.adapter_layer)
    with pytest.raises(ValueError, match="adapter_layer"):
        rotate_params(params, CFG.n_layers, 0)
    # a quantized tree must be rejected outright (silent skip of kernel_q
    # while zeroing norms would corrupt the model)
    qtree = dict(params)
    qtree["layers_0"] = dict(params["layers_0"])
    qtree["layers_0"]["attention"] = {
        "wq": {"kernel_q": np.zeros((CFG.dim, CFG.dim), np.int8),
               "scale": np.ones((CFG.dim,), np.float32)}}
    with pytest.raises(ValueError, match="QUANTIZED"):
        rotate_params(qtree, CFG.n_layers, CFG.adapter_layer)
