"""Audio fusion modes (reference: model.py:208-227, 306-322) and the audio
data path — including the fork-bug fix that makes audio projections
trainable (SURVEY.md §2, llama_vqa.py:71-77)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flipped_tpu.core.config import ModelConfig
from flipped_tpu.model import FlippedVQAModel
from flipped_tpu.train import is_trainable, partition_params

BASE = dict(dim=32, n_layers=2, n_heads=4, vocab_size=128, multiple_of=16,
            max_seq_len=32, adapter_len=4, adapter_layer=2, max_feats=4,
            visual_dim=16, audio_dim=24)


def build(merge):
    cfg = ModelConfig(audio_merge=merge, **BASE)
    model = FlippedVQAModel(cfg, dtype=jnp.float32, frozen_dtype=jnp.float32)
    b, f = 2, cfg.max_feats
    video = None if merge == "audio_only" else jnp.ones((b, f, 16))
    if merge == "attention":
        audio = jnp.ones((b, 1, 24))
    elif merge is None:
        audio = None
    else:
        audio = jnp.ones((b, f, 24))
    tokens = jnp.zeros((b, 8), jnp.int32)
    vs = jnp.zeros((b,), jnp.int32)
    splice = jnp.tile(jnp.arange(f)[None], (b, 1))
    params = model.init(jax.random.PRNGKey(0), tokens, video, audio, vs,
                        splice)
    return model, params, video, audio


@pytest.mark.parametrize("merge", [None, "audio_only", "sum", "concat",
                                   "attention"])
def test_fuse_shapes(merge):
    model, params, video, audio = build(merge)
    vf = model.apply(params, video, audio, method="fuse")
    assert vf.shape == (2, 4, 32)
    assert np.isfinite(np.asarray(vf)).all()


@pytest.mark.parametrize("merge,expected", [
    ("audio_only", {"audio_proj"}),
    ("sum", {"audio_proj", "visual_proj"}),
    ("concat", {"visual_proj"}),
    ("attention", {"audio_proj", "visual_proj", "video_audio_cross_attn"}),
])
def test_audio_params_are_trainable(merge, expected):
    """The fork freezes audio_proj/cross-attn at random init (reference:
    llama_vqa.py:71-77 name filter misses them); we train them."""
    model, params, *_ = build(merge)
    trainable, _ = partition_params(params["params"])
    names = set(trainable.keys())
    for name in expected:
        assert name in names, (merge, names)
        assert trainable[name] is not None


def test_sum_mode_is_sum_of_projections():
    model, params, video, audio = build("sum")
    vf = model.apply(params, video, audio, method="fuse")
    av = model.apply(params, None, audio,
                     method=lambda m, v, a: m.audio_proj(a))
    vv = model.apply(params, video, None,
                     method=lambda m, v, a: m.visual_proj(v))
    np.testing.assert_allclose(np.asarray(vf), np.asarray(av + vv),
                               rtol=1e-5, atol=1e-6)


def test_concat_projects_joint_features():
    model, params, video, audio = build("concat")
    kernel = params["params"]["visual_proj"]["kernel"]
    assert kernel.shape == (16 + 24, 32)  # joint [video; audio] projection


def test_attention_merge_cross_attends():
    """One audio vector attended by 10 video queries → output equals the
    (single) value row for every frame when there is one audio key."""
    model, params, video, audio = build("attention")
    vf = model.apply(params, video, audio, method="fuse")
    assert vf.shape == (2, 4, 32)
    # single audio key → softmax over 1 key = 1 → all frames share the value
    fused = np.asarray(vf)
    np.testing.assert_allclose(fused[:, 0], fused[:, 1], rtol=1e-5, atol=1e-6)


def test_audio_dataset_batch(tmp_path):
    """NExT-QA reader with audio=True produces audio arrays in the batch."""
    import torch
    from flipped_tpu.core.config import DataConfig
    from flipped_tpu.data import build_dataset, pack_train_batch
    from flipped_tpu.text import MockTokenizer

    d = tmp_path / "nextqa"
    d.mkdir()
    rows = ["video,type,answer,question,a0,a1,a2,a3,a4",
            "v0,CW,1,what happens,a,b,c,d,e"]
    (d / "train.csv").write_text("\n".join(rows))
    rs = np.random.RandomState(0)
    torch.save({"v0": torch.tensor(rs.randn(6, 768).astype(np.float32))},
               d / "clipvitl14.pth")
    torch.save({"v0": torch.tensor(rs.randn(10, 1024).astype(np.float32))},
               d / "audio_imagebind.pth")

    cfg = DataConfig(dataset="nextqa", data_root=str(tmp_path), batch_size=1,
                     max_seq_len=128, max_feats=10, audio=True,
                     audio_merge="sum")
    ds = build_dataset(cfg, MockTokenizer(), "train")
    item = ds.get_item(0)
    assert item.audio.shape == (10, 1024)
    batch = pack_train_batch([item], 10)
    assert batch["audio"].shape == (1, 10, 1024)
    assert batch["video"].shape == (1, 10, 768)
