"""Generation inference tests: KV-cache decode must match the reference's
full-re-forward greedy semantics (reference: model.py:429-467), and the
similarity matching must rank the generated answer's own option first."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.core.config import ModelConfig
from flipped_tpu.data import make_synthetic_items, pack_eval_batch
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.text import MockTokenizer
from flipped_tpu.train import merge_params, partition_params
from flipped_tpu.train.generation import (decode_generated,
                                          make_generation_step)

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=512,
                  multiple_of=16, max_seq_len=96, adapter_len=4,
                  adapter_layer=2, max_feats=4, visual_dim=16, bias=3.0)
TOK = MockTokenizer(CFG.vocab_size)
N_NEW = 9  # short horizon keeps the naive reference loop affordable


@pytest.fixture(scope="module")
def setup():
    model = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            trainable_dtype=jnp.float32)
    items = make_synthetic_items(TOK, 2, max_feats=CFG.max_feats,
                                 max_seq_len=CFG.max_seq_len, split="val",
                                 visual_dim=CFG.visual_dim, seed=11)
    batch = pack_eval_batch(items, CFG.max_feats)
    batch = {k: jnp.array(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}
    params = model.init(jax.random.PRNGKey(1), batch["vqa_tokens"][:, 0],
                        batch["video"], None, batch["vqa_video_start"],
                        batch["vqa_splice"])["params"]
    # non-zero gates so the adapter path participates
    for li in range(CFG.n_layers):
        params[f"layers_{li}"]["attention"]["gate1"] = (
            0.4 * jnp.ones(CFG.n_heads))
    return model, params, batch


def naive_greedy(model, params, batch, n_new):
    """The reference's algorithm: write each argmax token back into the
    sequence and re-run the FULL forward (model.py:429-467)."""
    p = {"params": params}
    tokens = np.asarray(batch["vqa_tokens"][:, 0]).copy()
    prefix = np.asarray(batch["prefix"])
    vf = model.apply(p, batch["video"], None, method="fuse")
    out = np.zeros((tokens.shape[0], n_new), np.int32)
    for b in range(tokens.shape[0]):
        toks = tokens[b:b + 1].copy()
        for i, pos in enumerate(range(prefix[b] - 1, prefix[b] - 1 + n_new)):
            h = model.apply(p, jnp.array(toks), vf[b:b + 1],
                            batch["vqa_video_start"][b:b + 1],
                            batch["vqa_splice"][b:b + 1], method="encode")
            logits = model.apply(p, h, method="lm_logits")
            pred = int(jnp.argmax(logits[0, pos]))
            out[b, i] = pred
            if pos + 1 < toks.shape[1]:
                toks[0, pos + 1] = pred
    return out


def test_kv_cache_matches_full_reforward(setup):
    model, params, batch = setup
    trainable, frozen = partition_params(params)
    gen_step = make_generation_step(model, TOK.eos_id, max_new_tokens=N_NEW)
    out = gen_step(trainable, frozen, batch)
    fast = np.asarray(out["generated"])
    slow = naive_greedy(model, params, batch, N_NEW)
    np.testing.assert_array_equal(fast, slow)


def test_similarity_selects_matching_option(setup):
    """If the generated answer tokens literally equal option k's answer span,
    cosine similarity must rank option k first."""
    model, params, batch = setup
    trainable, frozen = partition_params(params)
    gen_step = make_generation_step(model, TOK.eos_id, max_new_tokens=N_NEW)
    out = gen_step(trainable, frozen, batch)
    sims = np.asarray(out["similarity"])
    assert sims.shape == (2, 5)
    assert np.isfinite(sims).all()
    assert (np.asarray(out["prediction"]) == sims.argmax(-1)).all()

    # plant: overwrite generated row with option-2's span and re-pool by hand
    tokens = np.asarray(batch["vqa_tokens"])
    prefix = int(batch["prefix"][0])
    span = tokens[0, 2, prefix:]
    span = span[:np.argmax(span == TOK.eos_id)]  # cut at eos
    emb_table = np.asarray(params["tok_embeddings"]["embedding"], np.float32)
    gen_emb = emb_table[span].mean(0)
    opt_embs = []
    for k in range(5):
        sp = tokens[0, k, prefix:]
        sp = sp[:np.argmax(sp == TOK.eos_id)]
        opt_embs.append(emb_table[sp].mean(0))
    opt_embs = np.stack(opt_embs)
    sims = (opt_embs / np.linalg.norm(opt_embs, axis=-1, keepdims=True)) @ (
        gen_emb / np.linalg.norm(gen_emb))
    assert sims.argmax() == 2


def test_decode_generated_strings(setup):
    model, params, batch = setup
    trainable, frozen = partition_params(params)
    gen_step = make_generation_step(model, TOK.eos_id, max_new_tokens=N_NEW)
    out = gen_step(trainable, frozen, batch)
    s = decode_generated(TOK, np.asarray(out["generated"])[0], TOK.eos_id)
    assert isinstance(s, str)
