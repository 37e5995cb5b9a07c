"""Direct numerical parity against the ACTUAL reference implementation.

Imports the reference's own model code from /root/reference (read-only),
shims out its CUDA/sentencepiece dependencies, loads identical weights into
both implementations, and compares:
  * the three training losses (reference: llama/model.py:250-365), and
  * the eval per-option token-CE matrix (reference:
    llama/model_my_original_mod.py:249-508, engine.py:87-93).

The reference code is executed as an oracle, not copied. fp16 casts in the
reference are shimmed to identity so both sides compare in f32 (the
reference's .half() calls exist only because its weights live in fp16 on
GPU, llama_vqa.py:63-65).
"""
import os
import sys
import types
from argparse import Namespace

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference repo not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from flipped_tpu.core.config import ModelConfig  # noqa: E402
from flipped_tpu.data import (make_synthetic_items, pack_eval_batch,  # noqa: E402
                              pack_train_batch)
from flipped_tpu.model import FlippedVQAModel  # noqa: E402
from flipped_tpu.text import MockTokenizer  # noqa: E402
from flipped_tpu.train import compute_objective_losses, option_scores  # noqa: E402

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=512,
                  multiple_of=16, max_seq_len=96, adapter_len=4,
                  adapter_layer=2, max_feats=4, visual_dim=768, bias=3.0,
                  tau=100.0, norm_eps=1e-5)
TOK = MockTokenizer(CFG.vocab_size)


@pytest.fixture(scope="module")
def reference_modules(tmp_path_factory):
    """Import the reference's model modules with CPU/no-sentencepiece shims."""
    # fake sentencepiece so llama.tokenizer imports
    fake_sp = types.ModuleType("sentencepiece")

    class SentencePieceProcessor:
        def __init__(self, model_file=None):
            pass

        def vocab_size(self):
            return CFG.vocab_size

        def get_piece_size(self):
            return CFG.vocab_size

        def bos_id(self):
            return 1

        def eos_id(self):
            return 2

        def pad_id(self):
            return -1

        def encode(self, s):
            return [5]

        def decode(self, ids):
            return ""

    fake_sp.SentencePieceProcessor = SentencePieceProcessor
    added_sp = "sentencepiece" not in sys.modules
    sys.modules.setdefault("sentencepiece", fake_sp)

    # CPU shims: .cuda() → identity; .half() → identity (compare in f32)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.half = lambda self: self
    torch.nn.Module.half = lambda self: self

    sys.path.insert(0, REFERENCE)
    import llama.model as ref_model
    import llama.model_my_original_mod as ref_model_mod
    yield ref_model, ref_model_mod

    # Un-poison sys.modules: the 512-vocab sentencepiece shim must not leak
    # past this module, or a later in-process `import sentencepiece` (the
    # real-tokenizer CLI path) binds to it and reports the wrong vocab —
    # an order-dependent cross-file failure.
    if added_sp:
        sys.modules.pop("sentencepiece", None)


def ref_args(tmp_path):
    # the reference Transformer builds a Tokenizer from this path
    (tmp_path / "tokenizer.model").write_text("")
    return Namespace(
        llama_model_path=str(tmp_path) + "/", max_feats=CFG.max_feats,
        bias=CFG.bias, tau=CFG.tau, vaq=True, qav=True, audio=False,
        audio_only=False, audio_merge="none", debug=False,
        is_generation_task=False, max_seq_len=CFG.max_seq_len)


def build_mine(cfg=CFG):
    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            trainable_dtype=jnp.float32)
    items = make_synthetic_items(TOK, 2, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="train",
                                 visual_dim=cfg.visual_dim, seed=21)
    batch = pack_train_batch(items, cfg.max_feats)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.array(batch["vqa_tokens"]),
                        jnp.array(batch["video"]), None,
                        jnp.array(batch["vqa_video_start"]),
                        jnp.array(batch["vqa_splice"]))["params"]
    # non-trivial gates so both softmax segments matter. With
    # adapter_layer < n_layers only the active (last) blocks exist.
    for li in range(cfg.n_layers):
        if f"layers_{li}" not in params:
            continue
        a = dict(params[f"layers_{li}"]["attention"])
        a["gate1"] = 0.25 + 0.1 * jnp.arange(cfg.n_heads, dtype=jnp.float32)
        a["gate2"] = -2.0 + 0.3 * jnp.arange(cfg.n_heads, dtype=jnp.float32)
        params[f"layers_{li}"]["attention"] = a
    return model, params


def to_reference_state_dict(params, cfg=CFG):
    sd = {}
    t = lambda x: torch.tensor(np.asarray(x, np.float32))
    sd["tok_embeddings.weight"] = t(params["tok_embeddings"]["embedding"])
    sd["norm.weight"] = t(params["norm"]["weight"])
    sd["output.weight"] = t(params["output"]["kernel"]).t().contiguous()
    sd["adapter_query.weight"] = t(params["adapter_query"])
    sd["temporal_emb.weight"] = t(params["temporal_emb"])
    sd["visual_proj.weight"] = t(params["visual_proj"]["kernel"]).t().contiguous()
    for i in range(cfg.n_layers):
        if f"layers_{i}" not in params:
            continue  # block outside the active adapter window
        lp = params[f"layers_{i}"]
        for w in ("wq", "wk", "wv", "wo"):
            sd[f"layers.{i}.attention.{w}.weight"] = t(
                lp["attention"][w]["kernel"]).t().contiguous()
        for w in ("w1", "w2", "w3"):
            sd[f"layers.{i}.feed_forward.{w}.weight"] = t(
                lp["feed_forward"][w]["kernel"]).t().contiguous()
        sd[f"layers.{i}.attention_norm.weight"] = t(
            lp["attention_norm"]["weight"])
        sd[f"layers.{i}.ffn_norm.weight"] = t(lp["ffn_norm"]["weight"])
        sd[f"layers.{i}.attention.gate1"] = t(
            lp["attention"]["gate1"]).reshape(1, cfg.n_heads, 1, 1)
        sd[f"layers.{i}.attention.gate2"] = t(
            lp["attention"]["gate2"]).reshape(1, cfg.n_heads, 1, 1)
    return sd


def reference_data(batch, split="train"):
    """Assemble the reference's batch dict (dataloader/__init__.py:28-90)."""
    def expand(key):  # (B, S) → (B, 1, S) long
        return torch.tensor(np.asarray(batch[key])).long().unsqueeze(1)

    if split == "train":
        text_id = {k: expand(f"{k}_tokens") for k in ("vqa", "vaq", "qav")}
        label = {k: expand(f"{k}_labels") for k in ("vqa", "vaq", "qav")}
        video_start = {k: [int(batch[f"{k}_video_start"][0])]
                       for k in ("vqa", "vaq")}
        video_start["qav"] = [int(batch["qav_splice"][0, 0])]
        video_index = {"qav": torch.tensor(
            np.asarray(batch["qav_splice"])).long()}
    else:
        text_id = {"vqa": torch.tensor(np.asarray(batch["vqa_tokens"])).long(),
                   "vaq": torch.tensor(np.asarray(batch["vqa_tokens"])).long(),
                   "qav": torch.tensor(np.asarray(batch["vqa_tokens"])).long()}
        label = {"vqa": torch.tensor(np.asarray(batch["vqa_labels"])).long(),
                 "vaq": torch.tensor(np.asarray(batch["vqa_labels"])).long(),
                 "qav": torch.tensor(np.asarray(batch["vqa_labels"])).long()}
        video_start = {k: [int(batch["vqa_video_start"][0])]
                       for k in ("vqa", "vaq", "qav")}
        video_index = {"qav": torch.tensor(
            np.asarray(batch["vqa_splice"])).long()}
    return {
        "video": torch.tensor(np.asarray(batch["video"], np.float32)),
        "text_id": text_id, "label": label, "video_start": video_start,
        "video_index": video_index,
    }


def test_training_losses_match_reference(reference_modules, tmp_path):
    ref_model, _ = reference_modules
    model, params = build_mine()

    args = ref_args(tmp_path)
    margs = ref_model.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=4,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    missing, unexpected = ref.load_state_dict(to_reference_state_dict(params),
                                              strict=False)
    assert not [m for m in missing if "cache" not in m], missing

    items = make_synthetic_items(TOK, 2, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="train",
                                 visual_dim=CFG.visual_dim, seed=21)
    batch = pack_train_batch(items, CFG.max_feats)

    with torch.no_grad():
        ref_vqa, ref_vaq, ref_qav = ref(reference_data(batch, "train"))

    jbatch = {k: jnp.array(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    losses = compute_objective_losses(model, {"params": params}, jbatch,
                                      vaq=True, qav=True)

    np.testing.assert_allclose(float(losses.vqa), float(ref_vqa), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(float(losses.vaq), float(ref_vaq), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(float(losses.qav), float(ref_qav), rtol=2e-3,
                               atol=2e-3)


def test_training_gradients_match_reference(reference_modules, tmp_path):
    """TRAINING-STEP gradient oracle: backprop the summed triple loss through
    the reference's own torch autograd (trainable set per llama_vqa.py:71-76:
    names containing gate/adapter/temporal_emb/visual_proj) and through our
    jax.grad on identical weights/data, and compare every trainable leaf's
    gradient. This verifies what the forward-only parity tests cannot: the
    stop_gradient placement (frozen-embedding trick, llama.py vs
    model.py:360), the tanh(gate) gradient flow, and that the partitioned
    trainable set induces the same gradient field as the reference's
    requires_grad mask."""
    from flipped_tpu.train import merge_params, partition_params

    ref_model, _ = reference_modules
    model, params = build_mine()

    args = ref_args(tmp_path)
    margs = ref_model.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=4,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params), strict=False)
    for name, p in ref.named_parameters():
        p.requires_grad = any(m in name for m in
                              ("gate", "adapter", "temporal_emb",
                               "visual_proj"))

    items = make_synthetic_items(TOK, 2, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="train",
                                 visual_dim=CFG.visual_dim, seed=21)
    batch = pack_train_batch(items, CFG.max_feats)

    ref_vqa, ref_vaq, ref_qav = ref(reference_data(batch, "train"))
    (ref_vqa + ref_vaq + ref_qav).backward()
    ref_grads = {n: p.grad.detach().numpy()
                 for n, p in ref.named_parameters() if p.requires_grad}

    jbatch = {k: jnp.array(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    trainable, frozen = partition_params(params)

    def total_loss(tr):
        losses = compute_objective_losses(
            model, {"params": merge_params(tr, frozen)}, jbatch,
            vaq=True, qav=True)
        return losses.vqa + losses.vaq + losses.qav

    grads = jax.grad(total_loss)(trainable)

    def close(mine, theirs, what):
        mine, theirs = np.asarray(mine, np.float64), theirs.astype(np.float64)
        # mixed rel/abs: gradient entries span orders of magnitude
        np.testing.assert_allclose(
            mine, theirs, rtol=5e-3,
            atol=5e-4 * max(np.abs(theirs).max(), 1e-6), err_msg=what)

    close(grads["adapter_query"], ref_grads["adapter_query.weight"],
          "adapter_query")
    close(grads["temporal_emb"], ref_grads["temporal_emb.weight"],
          "temporal_emb")
    close(grads["visual_proj"]["kernel"],
          ref_grads["visual_proj.weight"].T, "visual_proj")
    for li in range(CFG.n_layers):
        a = grads[f"layers_{li}"]["attention"]
        close(a["gate1"],
              ref_grads[f"layers.{li}.attention.gate1"].reshape(-1),
              f"gate1 layer {li}")
        close(a["gate2"],
              ref_grads[f"layers.{li}.attention.gate2"].reshape(-1),
              f"gate2 layer {li}")
    # nothing else may receive gradient on either side: the reference has
    # exactly these requires_grad leaves, and our trainable tree has no
    # OTHER non-None leaf (audio markers are inactive in this config)
    extra = [n for n in ref_grads
             if not any(s in n for s in ("adapter_query", "temporal_emb",
                                         "visual_proj", "gate1", "gate2"))]
    assert not extra, extra
    n_mine = len([l for l in jax.tree_util.tree_leaves(grads)
                  if l is not None])
    assert n_mine == len(ref_grads), (n_mine, len(ref_grads))


def test_partial_adapter_window_matches_reference(reference_modules,
                                                  tmp_path):
    """adapter_layer < n_layers: the reference runs ONLY
    layers[-adapter_layer:] (model.py:338) — the early blocks are skipped
    entirely. Verify our _active_blocks() reproduces that, not the
    'all layers, adapter-free early' reading."""
    import dataclasses

    ref_model, _ = reference_modules
    cfg = dataclasses.replace(CFG, adapter_layer=1)
    model, params = build_mine(cfg)
    assert "layers_0" not in params  # skipped block is never materialized

    args = ref_args(tmp_path)
    margs = ref_model.ModelArgs(
        dim=cfg.dim, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        vocab_size=cfg.vocab_size, multiple_of=cfg.multiple_of,
        norm_eps=cfg.norm_eps, max_batch_size=4,
        max_seq_len=cfg.max_seq_len, adapter_len=cfg.adapter_len,
        adapter_layer=1)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params, cfg), strict=False)

    items = make_synthetic_items(TOK, 2, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="train",
                                 visual_dim=cfg.visual_dim, seed=21)
    batch = pack_train_batch(items, cfg.max_feats)
    with torch.no_grad():
        ref_vqa, ref_vaq, ref_qav = ref(reference_data(batch, "train"))

    jbatch = {k: jnp.array(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    losses = compute_objective_losses(model, {"params": params}, jbatch,
                                      vaq=True, qav=True)
    np.testing.assert_allclose(float(losses.vqa), float(ref_vqa), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(float(losses.vaq), float(ref_vaq), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(float(losses.qav), float(ref_qav), rtol=2e-3,
                               atol=2e-3)


def test_option_pooling_matches_reference(reference_modules, tmp_path):
    """Generation-eval choice embeddings: the reference pads each item's
    option spans to the longest with id 0 and mean-pools over that padded
    length (extract_answers + embed_and_aggregate_answers,
    model.py:552-576). pool_option_embeddings must reproduce it exactly."""
    from flipped_tpu.train.generation import pool_option_embeddings

    ref_model, _ = reference_modules
    model, params = build_mine()

    args = ref_args(tmp_path)
    margs = ref_model.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=16,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params), strict=False)
    # the reference reads hardcoded LLaMA anchor ids from its tokenizer;
    # our 512-vocab mock uses the small-vocab anchors
    ref.answer_token_id = TOK.a_token_id
    ref.eos_id = TOK.eos_id

    items = make_synthetic_items(TOK, 3, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="val",
                                 visual_dim=CFG.visual_dim, seed=33)
    batch = pack_eval_batch(items, CFG.max_feats)
    b, n_opt, s = batch["vqa_tokens"].shape

    vqa_id = torch.tensor(np.asarray(batch["vqa_tokens"])).long()
    with torch.no_grad():
        extracted = ref.extract_answers(vqa_id, b, n_opt, s)
        ref_emb = ref.embed_and_aggregate_answers(extracted).numpy()

    mine = np.asarray(pool_option_embeddings(
        model, {"params": params}, jnp.array(batch["vqa_tokens"]),
        jnp.array(batch["prefix"], jnp.int32), TOK.eos_id))
    np.testing.assert_allclose(mine, ref_emb, rtol=1e-5, atol=1e-5)


def test_generation_inference_end_to_end_matches_reference(reference_modules,
                                                           tmp_path):
    """COMPOSED generation-inference parity (round-2 verdict, missing #2):
    run the reference's full `Transformer.inference` (model.py:367-546 —
    31-position greedy re-forward decode → extract_answers →
    embed_and_aggregate → find_most_similar) on identical weights and data,
    and assert our `make_generation_step` + `decode_generated` reproduce the
    greedy tokens, the cosine similarities, the predicted option AND the
    extracted answer strings end-to-end — not just the tested pieces."""
    import dataclasses
    import types as _types

    ref_model, _ = reference_modules
    # vocab must exceed the reference's hardcoded question-anchor id 894
    # (model.py:529 `.index(894)`), and S must leave room for the 31
    # generated positions after `prefix` (the reference indexes
    # prefix+30 unguarded, model.py:461 — its real recipes use S ≥ 128)
    cfg = dataclasses.replace(CFG, vocab_size=1024, max_seq_len=128)
    tok = MockTokenizer(cfg.vocab_size)

    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            trainable_dtype=jnp.float32)
    items = make_synthetic_items(tok, 3, max_feats=cfg.max_feats,
                                 max_seq_len=cfg.max_seq_len, split="val",
                                 visual_dim=cfg.visual_dim, seed=44)
    batch = pack_eval_batch(items, cfg.max_feats)
    # plant the reference's hardcoded question anchor before the answer span
    # — identical input ids on both sides, so parity is unaffected
    batch["vqa_tokens"][:, :, 2] = 894

    params = model.init(jax.random.PRNGKey(5),
                        jnp.array(batch["vqa_tokens"][:, 0]),
                        jnp.array(batch["video"]), None,
                        jnp.array(batch["vqa_video_start"]),
                        jnp.array(batch["vqa_splice"]))["params"]
    for li in range(cfg.n_layers):
        if f"layers_{li}" not in params:
            continue
        a = dict(params[f"layers_{li}"]["attention"])
        a["gate1"] = 0.25 + 0.1 * jnp.arange(cfg.n_heads, dtype=jnp.float32)
        a["gate2"] = -2.0 + 0.3 * jnp.arange(cfg.n_heads, dtype=jnp.float32)
        params[f"layers_{li}"]["attention"] = a

    args = ref_args(tmp_path)
    margs = ref_model.ModelArgs(
        dim=cfg.dim, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        vocab_size=cfg.vocab_size, multiple_of=cfg.multiple_of,
        norm_eps=cfg.norm_eps, max_batch_size=16,
        max_seq_len=cfg.max_seq_len, adapter_len=cfg.adapter_len,
        adapter_layer=cfg.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params, cfg), strict=False)
    # small-vocab anchors + a real decode (the fixture's sentencepiece shim
    # decodes to "", which would make the string assertion vacuous)
    ref.answer_token_id = tok.a_token_id
    ref.eos_id = tok.eos_id
    ref.tokenizer = _types.SimpleNamespace(
        decode=lambda ids: tok.decode(ids))

    b, n_opt, s = batch["vqa_tokens"].shape
    prefix = batch["prefix"].astype(np.int64)
    assert (prefix == prefix[0]).all()  # synthetic template → one prefix
    data = {
        "video": torch.tensor(np.asarray(batch["video"], np.float32)),
        "text_id": {"vqa": torch.tensor(
            np.asarray(batch["vqa_tokens"])).long()},
        "label": {"vqa": torch.tensor(
            np.asarray(batch["vqa_labels"])).long()},
        "video_start": {"vqa": [int(batch["vqa_video_start"][0])]},
        "prefix_index": {"vqa": [int(p) for p in prefix]},
        "vid": [f"v{i}" for i in range(b)],
    }
    with torch.no_grad():
        ref_pred, ref_answers = ref.inference(
            {k: (v if not isinstance(v, dict) else dict(v))
             for k, v in data.items()})
    # the reference writes its greedy tokens into data's vqa_id in place —
    # recover them per row from the mutated tensor
    mutated = data["text_id"]["vqa"][:, 0, :].numpy()
    ref_generated = np.stack([mutated[i, prefix[i]:prefix[i] + 31]
                              for i in range(b)])

    from flipped_tpu.train import partition_params
    from flipped_tpu.train.generation import (decode_generated,
                                              make_generation_step)

    trainable, frozen = partition_params(params)
    jbatch = {k: jnp.array(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)
              and k not in ("answer", "qtype", "qid", "span_need", "span_exact")}
    out = make_generation_step(model, tok.eos_id)(trainable, frozen, jbatch)

    # greedy token stream identical (KV-cached decode ≡ the reference's
    # full re-forward per position, causality argument in generation.py)
    np.testing.assert_array_equal(np.asarray(out["generated"]),
                                  ref_generated)
    # cosine similarities + predicted option identical
    np.testing.assert_array_equal(np.asarray(out["prediction"]),
                                  ref_pred.numpy())
    # extracted answer strings identical
    for i in range(b):
        mine = decode_generated(tok, np.asarray(out["generated"])[i],
                                tok.eos_id)
        assert mine == ref_answers[i]["generated_answer"], (
            i, mine, ref_answers[i])


def test_multi_step_training_trajectory_matches_reference(reference_modules,
                                                          tmp_path):
    """TRAINING-LOOP trajectory oracle (round-3 verdict, missing #2): run the
    reference's OWN `engine.train_one_epoch` (engine.py:10-56 — per-accum-step
    cosine LR via lr_sched.py:9-21, loss/accum_iter scaling + step every
    accum_iter per misc.py:253-294, timm wd-grouped AdamW per train.py:119-121)
    for 30 optimizer updates at accum_iter=2 on identical tiny weights and the
    identical synthetic-data stream, against our jit `make_train_step` +
    `make_optimizer`, and assert:
      * the per-update loss trajectories track (catches slow numerical drift
        that single-step tolerances cannot),
      * the final trainable parameters agree leaf-by-leaf, and
      * post-training eval decisions (argmin mean token-CE, engine.py:87-93)
        match between each side's own trained weights.
    This is the strongest locally-achievable evidence toward BASELINE.md's
    accuracy-parity north star without real LLaMA weights/datasets."""
    import optax

    from flipped_tpu.core.config import TrainConfig
    from flipped_tpu.data import add_accum_axis
    from flipped_tpu.train import (make_optimizer, make_train_step,
                                   merge_params, partition_params)

    ref_model, ref_model_mod = reference_modules
    sys.path.insert(0, REFERENCE)
    import engine as ref_engine

    torch.cuda.synchronize = lambda *a, **k: None  # engine.py:43, CPU oracle

    N_UPDATES, ACCUM, B = 30, 2, 2
    n_data_steps = N_UPDATES * ACCUM

    model, params = build_mine()

    args = ref_args(tmp_path)
    # the reference's loop-level hyperparams (train.py:104-107 lr scaling is
    # applied below; fractional warmup exercises BOTH schedule branches
    # inside the single epoch, lr_sched.py:11-15)
    tcfg = TrainConfig(epochs=1, warmup_epochs=0.4, accum_iter=ACCUM,
                       blr=0.8, weight_decay=0.14, vaq=True, qav=True)
    world_batch = B * ACCUM  # eff_batch_size, train.py:103
    args.accum_iter = ACCUM
    args.lr = tcfg.absolute_lr(world_batch)
    args.min_lr = tcfg.min_lr
    args.warmup_epochs = tcfg.warmup_epochs
    args.epochs = tcfg.epochs

    margs = ref_model.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=4,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params), strict=False)
    for name, p in ref.named_parameters():
        p.requires_grad = any(m in name for m in
                              ("gate", "adapter", "temporal_emb",
                               "visual_proj"))

    # timm param_groups_weight_decay (train.py:119-121): decay only on
    # ndim>1 trainables; the package is absent here so the documented
    # grouping is built inline (same as our wd_mask, optim.py:121-133)
    decay = [p for p in ref.parameters() if p.requires_grad and p.ndim > 1]
    no_decay = [p for p in ref.parameters() if p.requires_grad and p.ndim <= 1]
    ref_opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": tcfg.weight_decay},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=args.lr, betas=(0.9, 0.95))

    # identical per-data-step synthetic batches for both sides
    step_batches = [pack_train_batch(
        make_synthetic_items(TOK, B, max_feats=CFG.max_feats,
                             max_seq_len=CFG.max_seq_len, split="train",
                             visual_dim=CFG.visual_dim, seed=1000 + i),
        CFG.max_feats) for i in range(n_data_steps)]

    class _Recorder(torch.nn.Module):
        """Wraps the reference model to record per-data-step losses (the
        engine only returns epoch-averaged meters)."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner
            self.losses = []

        def forward(self, data):
            out = self.inner(data)
            self.losses.append([float(x) for x in out])
            return out

    recorder = _Recorder(ref)
    loader = [reference_data(b, "train") for b in step_batches]
    from util.misc import NativeScalerWithGradNormCount
    scaler = NativeScalerWithGradNormCount()  # auto-disabled on CPU: plain
    ref_engine.train_one_epoch(recorder, loader, ref_opt, epoch=0,  # bwd+step
                               loss_scaler=scaler, args=args)
    assert len(recorder.losses) == n_data_steps
    ref_steps = np.array(recorder.losses)              # (60, 3)
    ref_updates = ref_steps.reshape(N_UPDATES, ACCUM, 3).sum(-1).mean(-1)

    # --- our side: identical weights, data order, schedule --------------
    trainable, frozen = partition_params(params)
    tx = make_optimizer(tcfg, steps_per_epoch=n_data_steps,
                        world_batch=world_batch)
    opt_state = tx.init(trainable)
    train_step = make_train_step(model, tx, vaq=True, qav=True)

    mine_updates = []
    for u in range(N_UPDATES):
        cat = {k: np.concatenate([step_batches[2 * u][k],
                                  step_batches[2 * u + 1][k]])
               for k in step_batches[0]}
        jb = {k: jnp.array(v) for k, v in add_accum_axis(cat, ACCUM).items()}
        trainable, opt_state, metrics = train_step(trainable, opt_state,
                                                   frozen, jb)
        mine_updates.append(float(metrics.loss))
    mine_updates = np.array(mine_updates)

    # trajectory tracks: per-update relative deltas stay at f32-noise level
    # across the whole run, with no compounding drift toward the tail
    rel = np.abs(mine_updates - ref_updates) / np.abs(ref_updates)
    assert rel.mean() < 2e-3, (rel.mean(), mine_updates, ref_updates)
    assert rel.max() < 1e-2, (rel.argmax(), rel.max())
    assert rel[-5:].mean() < 4e-3, ("tail drift", rel[-5:])

    # final trainable parameters agree leaf-by-leaf
    ref_final = {n: p.detach().numpy() for n, p in ref.named_parameters()
                 if p.requires_grad}

    def close(mine, theirs, what):
        # 30 f32 AdamW updates accumulate rounding: near-zero entries drift
        # by ~2e-4 abs, so the atol floor scales with the leaf's magnitude
        np.testing.assert_allclose(
            np.asarray(mine, np.float64), theirs.astype(np.float64),
            rtol=5e-3, atol=2e-3 * max(np.abs(theirs).max(), 1e-6),
            err_msg=what)

    close(trainable["adapter_query"], ref_final["adapter_query.weight"],
          "adapter_query")
    close(trainable["temporal_emb"], ref_final["temporal_emb.weight"],
          "temporal_emb")
    close(trainable["visual_proj"]["kernel"],
          ref_final["visual_proj.weight"].T, "visual_proj")
    for li in range(CFG.n_layers):
        a = trainable[f"layers_{li}"]["attention"]
        close(a["gate1"],
              ref_final[f"layers.{li}.attention.gate1"].reshape(-1),
              f"gate1 layer {li}")
        close(a["gate2"],
              ref_final[f"layers.{li}.attention.gate2"].reshape(-1),
              f"gate2 layer {li}")

    # post-training EVAL decisions match: score a val batch with each
    # side's own trained weights (the ±0.3-pt accuracy-parity proxy)
    margs_eval = ref_model_mod.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=64,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    args.vaq = args.qav = False
    torch.manual_seed(0)
    ref_eval = ref_model_mod.Transformer(margs_eval, args)
    ref_eval.load_state_dict(ref.state_dict(), strict=False)

    items = make_synthetic_items(TOK, 8, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="val",
                                 visual_dim=CFG.visual_dim, seed=77)
    ebatch = pack_eval_batch(items, CFG.max_feats)
    with torch.no_grad():
        individual = ref_eval(reference_data(ebatch, "val"), inference=True)
    count = (individual != 0).sum(-1)
    ref_scores = (individual.sum(-1) / count).numpy()

    jeb = {k: jnp.array(v) for k, v in ebatch.items()
           if isinstance(v, np.ndarray)}
    mine_scores = np.asarray(option_scores(
        model, {"params": merge_params(trainable, frozen)}, jeb))
    np.testing.assert_allclose(mine_scores, ref_scores, rtol=5e-3, atol=5e-3)
    assert (mine_scores.argmin(-1) == ref_scores.argmin(-1)).all()


def test_eval_option_scores_match_reference(reference_modules, tmp_path):
    """Per-option mean token-CE (the quantity whose argmin is the
    prediction, engine.py:87-93) must match the reference's
    classification-inference path."""
    _, ref_model_mod = reference_modules
    model, params = build_mine()

    args = ref_args(tmp_path)
    args.vaq = args.qav = False
    margs = ref_model_mod.ModelArgs(
        dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
        vocab_size=CFG.vocab_size, multiple_of=CFG.multiple_of,
        norm_eps=CFG.norm_eps, max_batch_size=16,
        max_seq_len=CFG.max_seq_len, adapter_len=CFG.adapter_len,
        adapter_layer=CFG.adapter_layer)
    torch.manual_seed(0)
    ref = ref_model_mod.Transformer(margs, args)
    ref.load_state_dict(to_reference_state_dict(params), strict=False)

    items = make_synthetic_items(TOK, 2, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="val",
                                 visual_dim=CFG.visual_dim, seed=22)
    batch = pack_eval_batch(items, CFG.max_feats)

    with torch.no_grad():
        individual = ref(reference_data(batch, "val"), inference=True)
    count = (individual != 0).sum(-1)
    ref_scores = (individual.sum(-1) / count).numpy()   # (B, n_opt)

    jbatch = {k: jnp.array(v) for k, v in batch.items()
              if isinstance(v, np.ndarray)}
    mine = np.asarray(option_scores(model, {"params": params}, jbatch))

    np.testing.assert_allclose(mine, ref_scores, rtol=2e-3, atol=2e-3)
    # and the resulting predictions agree exactly
    assert (mine.argmin(-1) == ref_scores.argmin(-1)).all()

    # the prefix-shared cached scorer matches the reference oracle too
    from flipped_tpu.train import option_scores_cached
    cached = np.asarray(option_scores_cached(model, {"params": params},
                                             jbatch, span_len=16))
    np.testing.assert_allclose(cached, ref_scores, rtol=2e-3, atol=2e-3)
    assert (cached.argmin(-1) == ref_scores.argmin(-1)).all()
