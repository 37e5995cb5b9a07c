"""Text-layer parity against the ACTUAL reference prompt builders.

Runs the reference's llama/tokenizer.py and dataloader label construction as
oracles, with SentencePiece shimmed to the same deterministic word-level
encoder as our MockTokenizer — so both sides assemble prompts from identical
token streams and every structural decision (placeholder layout, prefix
arithmetic, option expansion, label masking, dialogue middle-truncation) is
compared exactly. This is the 'highest-risk parity surface' of SURVEY.md §7.
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

import torch  # noqa: E402

from flipped_tpu.text import (MockTokenizer, PromptText,  # noqa: E402
                              build_dialogue_text_features,
                              build_text_features, encode_dqav, encode_dvaq,
                              encode_dvqa, encode_qav, encode_vaq, encode_vqa)

MOCK = MockTokenizer()
ANSWER_MAPPING = {0: "(A)", 1: "(B)", 2: "(C)", 3: "(D)", 4: "(E)"}


@pytest.fixture(scope="module")
def ref_tokenizer(tmp_path_factory):
    fake_sp = types.ModuleType("sentencepiece")

    class SentencePieceProcessor:
        def __init__(self, model_file=None):
            pass

        def vocab_size(self):
            return MOCK.n_words

        def get_piece_size(self):
            return MOCK.n_words

        def bos_id(self):
            return MOCK.bos_id

        def eos_id(self):
            return MOCK.eos_id

        def pad_id(self):
            return MOCK.pad_id

        def encode(self, s):
            return MOCK.encode_raw(s)

        def decode(self, ids):
            return MOCK.decode(ids)

    fake_sp.SentencePieceProcessor = SentencePieceProcessor
    prior_sp = sys.modules.get("sentencepiece")
    sys.modules["sentencepiece"] = fake_sp
    # the reference dataloader package imports pysrt at package level
    fake_pysrt = types.ModuleType("pysrt")
    fake_pysrt.open = lambda *a, **k: []
    added_pysrt = "pysrt" not in sys.modules
    sys.modules.setdefault("pysrt", fake_pysrt)
    for mod in list(sys.modules):
        if mod == "llama" or mod.startswith("llama."):
            del sys.modules[mod]
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from llama.tokenizer import Tokenizer

    tmp = tmp_path_factory.mktemp("tok")
    (tmp / "tokenizer.model").write_text("")

    def make(generation=False):
        return Tokenizer(model_path=str(tmp / "tokenizer.model"),
                         args=Namespace(is_generation_task=generation,
                                        debug=False))

    yield make

    # Un-poison sys.modules: leaving the 512-vocab fake installed makes any
    # LATER in-process `import sentencepiece` (e.g. load_tokenizer's real
    # tokenizer.model path in the CLI tests) silently bind to the shim and
    # report the wrong vocab — an order-dependent failure that only shows
    # when whole files run together.
    if prior_sp is None:
        sys.modules.pop("sentencepiece", None)
    else:
        sys.modules["sentencepiece"] = prior_sp
    if added_pysrt:
        sys.modules.pop("pysrt", None)


def sample_text():
    options = ["ride a bike", "swim", "fall down", "sing loudly", "sleep"]
    o_text = "Choices: \n" + "".join(
        f"{ANSWER_MAPPING[i]} {options[i]}\n" for i in range(5))
    return dict(q_text="Question: What does the tall man do after that?\n",
                o_text=o_text, a_text="Answer: The answer is ",
                options=options)


def as_prompt(text):
    return PromptText(**{k: v for k, v in text.items()
                         if k in ("q_text", "o_text", "a_text", "d_text")},
                      options=text.get("options", []))


@pytest.mark.parametrize("split", ["train", "val"])
@pytest.mark.parametrize("answer", [0, 3])
def test_vqa_vaq_qav_match_reference(ref_tokenizer, split, answer):
    ref = ref_tokenizer(generation=False)
    text = sample_text()

    rt, rp, rv = ref.encode_vqa(text=text, max_feats=10, split=split,
                                answer_mapping=ANSWER_MAPPING, answer=answer)
    mt, mp, mv = encode_vqa(MOCK, as_prompt(text), 10, split,
                            ANSWER_MAPPING, answer)
    assert mt == rt and mp == rp and mv == rv

    rt, rp, rv = ref.encode_vaq(text=text, max_feats=10, split=split,
                                answer_mapping=ANSWER_MAPPING, answer=answer)
    mt, mp, mv = encode_vaq(MOCK, as_prompt(text), 10, split,
                            ANSWER_MAPPING, answer)
    assert mt == rt and mp == rp and mv == rv

    rt, rp = ref.encode_qav(text=text, max_feats=10, split=split,
                            answer_mapping=ANSWER_MAPPING, answer=answer)
    mt, mp = encode_qav(MOCK, as_prompt(text), 10, split, ANSWER_MAPPING,
                        answer)
    assert mt == rt and mp == rp


@pytest.mark.parametrize("split", ["train", "val"])
def test_generation_variants_match_reference(ref_tokenizer, split):
    ref = ref_tokenizer(generation=True)
    text = sample_text()
    answer = 1

    rt, rp, rv = ref.encode_vqa(text=text, max_feats=10, split=split,
                                answer_mapping=ANSWER_MAPPING, answer=answer,
                                options=text["options"])
    mt, mp, mv = encode_vqa(MOCK, as_prompt(text), 10, split,
                            ANSWER_MAPPING, answer, generation=True)
    assert mt == rt and mp == rp and mv == rv

    rt, rp, rv = ref.encode_vaq(text=text, max_feats=10, split=split,
                                answer_mapping=ANSWER_MAPPING, answer=answer,
                                options=text["options"])
    mt, mp, mv = encode_vaq(MOCK, as_prompt(text), 10, split,
                            ANSWER_MAPPING, answer, generation=True)
    assert mt == rt and mp == rp and mv == rv

    rt, rp = ref.encode_qav(text=text, max_feats=10, split=split,
                            answer_mapping=ANSWER_MAPPING, answer=answer,
                            options=text["options"])
    mt, mp = encode_qav(MOCK, as_prompt(text), 10, split, ANSWER_MAPPING,
                        answer, generation=True)
    assert mt == rt and mp == rp


@pytest.mark.parametrize("split", ["train", "val"])
def test_dialogue_encoders_match_reference(ref_tokenizer, split):
    ref = ref_tokenizer(generation=False)
    mapping = {0: "(A)", 1: "(B)"}
    text = dict(q_text="Question: Which event is more likely to happen right after?\n",
                o_text="Choices: \n(A) he leaves the room\n(B) he stays\n",
                a_text="Answer: The answer is ",
                d_text="Dialogue: hello there how are you doing today\n")

    r = ref.encode_dvqa(text=text, max_feats=10, split=split,
                        answer_mapping=mapping, answer=0)
    m = encode_dvqa(MOCK, as_prompt(text), 10, split, mapping, 0)
    assert list(m) == list(r)

    r = ref.encode_dvaq(text=text, max_feats=10, split=split,
                        answer_mapping=mapping, answer=1)
    m = encode_dvaq(MOCK, as_prompt(text), 10, split, mapping, 1)
    assert list(m) == list(r)

    r = ref.encode_dqav(text=text, max_feats=10, max_seq_len=128, split=split,
                        answer_mapping=mapping, answer=0)
    m = encode_dqav(MOCK, as_prompt(text), 10, split, mapping, 0)
    assert list(m) == list(r)


@pytest.mark.parametrize("split", ["train", "val"])
@pytest.mark.parametrize("answer", [0, 2])
def test_base_dataset_labels_match_reference(ref_tokenizer, split, answer):
    """Full _get_text_token parity: ids, labels, masks, video spans
    (reference: dataloader/base_dataset.py:30-174)."""
    ref_tok = ref_tokenizer(generation=False)
    from dataloader.base_dataset import BaseDataset

    ds = object.__new__(BaseDataset)
    ds.args = Namespace(debug=False)
    ds.max_feats = 10
    ds.max_seq_len = 128
    ds.tokenizer = ref_tok
    ds.split = split
    ds.answer_mapping = ANSWER_MAPPING

    text = sample_text()
    r_tid, r_lab, r_vs, r_vi, r_lm, r_pi = ds._get_text_token(
        text, answer, options=text["options"])

    f = build_text_features(MOCK, as_prompt(text), 10, 128, split,
                            ANSWER_MAPPING, answer)
    for k in ("vqa", "vaq", "qav"):
        np.testing.assert_array_equal(f.text_id[k], r_tid[k].numpy(),
                                      err_msg=f"text_id[{k}]")
        np.testing.assert_array_equal(f.label[k], r_lab[k].numpy(),
                                      err_msg=f"label[{k}]")
        np.testing.assert_array_equal(f.label_mask[k], r_lm[k].numpy(),
                                      err_msg=f"label_mask[{k}]")
        assert f.video_start[k] == r_vs[k]
        np.testing.assert_array_equal(f.video_index[k], r_vi[k].numpy())
        assert f.prefix_index[k] == r_pi[k]


@pytest.mark.parametrize("n_dialogue", [4, 220])
def test_vlep_dialogue_truncation_matches_reference(ref_tokenizer, n_dialogue):
    """VLEP's middle-truncating _get_text_token (reference: vlep.py:73-154),
    short and overflowing dialogues."""
    ref_tok = ref_tokenizer(generation=False)
    from dataloader.vlep import VLEP

    ds = object.__new__(VLEP)
    ds.args = Namespace(debug=False)
    ds.max_feats = 10
    ds.max_seq_len = 128
    ds.tokenizer = ref_tok
    ds.split = "train"
    ds.sub = True
    ds.answer_mapping = {0: "(A)", 1: "(B)"}

    text = dict(q_text="Question: Which event is more likely to happen right after?\n",
                o_text="Choices: \n(A) he leaves\n(B) he stays\n",
                a_text="Answer: The answer is ",
                d_text="Dialogue: " + " ".join(
                    f"word{i}" for i in range(n_dialogue)) + "\n")
    r_tid, r_lab, r_vs, r_vi, r_lm = ds._get_text_token(text, 0)

    f = build_dialogue_text_features(MOCK, as_prompt(text), 10, 128, "train",
                                     ds.answer_mapping, 0, sub=True)
    for k in ("vqa", "vaq", "qav"):
        np.testing.assert_array_equal(f.text_id[k], r_tid[k].numpy(),
                                      err_msg=f"text_id[{k}] n={n_dialogue}")
        np.testing.assert_array_equal(f.label[k], r_lab[k].numpy(),
                                      err_msg=f"label[{k}] n={n_dialogue}")
        assert f.video_start[k] == r_vs[k]
