"""Checkpoint converter + manager tests: Meta-style shard merge round-trip
(reference: llama_vqa.py:25-58) and adapter-only save/resume
(reference: util/misc.py:297-336)."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.ckpt import (CheckpointManager, convert_meta_checkpoint,
                              export_reference_style, load_frozen_params,
                              torch_name_to_flax_path, needs_transpose)
from flipped_tpu.core.config import ModelConfig, TrainConfig
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.train import (make_optimizer, partition_params)

CFG = ModelConfig(dim=32, n_layers=2, n_heads=4, vocab_size=128,
                  multiple_of=16, max_seq_len=32, adapter_len=4,
                  adapter_layer=2, max_feats=4, visual_dim=16)


def tiny_params(seed=0):
    model = FlippedVQAModel(CFG, dtype=jnp.float32, frozen_dtype=jnp.float32,
                            trainable_dtype=jnp.float32)
    rng = jax.random.PRNGKey(seed)
    tokens = jnp.zeros((1, 8), jnp.int32)
    video = jnp.zeros((1, CFG.max_feats, CFG.visual_dim))
    vs = jnp.zeros((1,), jnp.int32)
    splice = jnp.zeros((1, CFG.max_feats), jnp.int32)
    return model, model.init(rng, tokens, video, None, vs, splice)["params"]


def test_name_mapping():
    assert (torch_name_to_flax_path("layers.3.attention.wq.weight")
            == "layers_3/attention/wq/kernel")
    assert (torch_name_to_flax_path("layers.0.attention_norm.weight")
            == "layers_0/attention_norm/weight")
    assert torch_name_to_flax_path("tok_embeddings.weight") == "tok_embeddings/embedding"
    assert torch_name_to_flax_path("output.weight") == "output/kernel"
    assert torch_name_to_flax_path("norm.weight") == "norm/weight"
    assert needs_transpose("layers.1.feed_forward.w2.weight")
    assert not needs_transpose("tok_embeddings.weight")


@pytest.mark.parametrize("n_shards", [1, 2])
def test_convert_roundtrip(tmp_path, n_shards):
    """flax params → Meta-style TP shards → converter → identical tree."""
    model, params = tiny_params()
    meta_params = dict(dim=CFG.dim, n_layers=CFG.n_layers, n_heads=CFG.n_heads,
                       norm_eps=CFG.norm_eps, vocab_size=-1,
                       multiple_of=CFG.multiple_of)
    ref_dir = tmp_path / "meta"
    export_reference_style(params, n_shards, str(ref_dir), meta_params)
    assert len(list(ref_dir.glob("*.pth"))) == n_shards

    out = tmp_path / "model.safetensors"
    got_params = convert_meta_checkpoint(str(ref_dir), str(out))
    assert got_params["n_layers"] == CFG.n_layers

    frozen = load_frozen_params(str(out))
    # every frozen leaf must match (bf16-rounded) the original
    _, ref_frozen = partition_params(params)

    def compare(path, ref_node, got_node):
        for k, v in ref_node.items():
            if v is None:
                continue
            if isinstance(v, dict):
                compare(path + [k], v, got_node.get(k, {}))
            else:
                got = got_node[k]
                assert got.dtype == jnp.bfloat16
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), np.asarray(v),
                    rtol=8e-3, atol=8e-3,
                    err_msg="/".join(path + [k]))

    compare([], ref_frozen, frozen)


def test_manager_roundtrip(tmp_path):
    model, params = tiny_params()
    trainable, _ = partition_params(params)
    tx = make_optimizer(TrainConfig(lr=1e-3), steps_per_epoch=10,
                        world_batch=4)
    opt_state = tx.init(trainable)

    mgr = CheckpointManager(str(tmp_path / "out"))
    mgr.save("checkpoint_best", trainable, opt_state, epoch=3, best_acc=0.71)
    assert mgr.exists("checkpoint_best")

    # perturb, then restore into templates
    perturbed = jax.tree_util.tree_map(lambda x: x + 1.0, trainable)
    got_t, got_o, meta = mgr.restore("checkpoint_best", perturbed, opt_state)
    assert meta["epoch"] == 3 and abs(meta["best_acc"] - 0.71) < 1e-9
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got_t, trainable)
