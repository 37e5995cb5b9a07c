"""Label/mask construction parity tests (reference semantics:
dataloader/base_dataset.py:17-174, vlep.py:73-101)."""
import numpy as np
import pytest

from flipped_tpu.text import (MockTokenizer, PromptText,
                              build_dialogue_text_features,
                              build_text_features, lm_labels, pad_ids,
                              qav_labels, sanitize_text_id)

ANSWER_MAPPING = {0: "(A)", 1: "(B)", 2: "(C)", 3: "(D)", 4: "(E)"}


def sample_text():
    options = ["red", "green", "blue", "black", "white"]
    o_text = "Choices: \n" + "".join(
        f"{ANSWER_MAPPING[i]} {options[i]}\n" for i in range(5))
    return PromptText(q_text="Question: What color is the car?\n",
                      o_text=o_text, a_text="Answer: The answer is ",
                      options=options)


def test_pad_ids_pads_with_minus_one():
    out = pad_ids([[1, 2, 3]], 6)
    assert out.tolist() == [[1, 2, 3, -1, -1, -1]]


def test_pad_ids_truncates_overflow():
    out = pad_ids([list(range(10))], 4)
    assert out.tolist() == [[0, 1, 2, 3]]


def test_lm_labels_mask_prefix_and_padding():
    padded = np.array([[1, 5, 6, 7, 2, -1, -1]], dtype=np.int32)
    label, mask = lm_labels(padded, prefix_index=3)
    # prefix (first 3) and the -1 padding are zeroed and masked out
    assert label.tolist() == [[0, 0, 0, 7, 2, 0, 0]]
    assert mask.tolist() == [[0, 0, 0, 1, 1, 0, 0]]


def test_qav_labels_arange_on_video_span():
    padded = np.zeros((1, 12), dtype=np.int32)
    label, mask = qav_labels(padded, prefix_index=5, max_feats=4)
    assert label.tolist() == [[-1] * 5 + [0, 1, 2, 3] + [-1] * 3]
    assert mask[0, 5] == 1.0 and mask.sum() == 1.0


def test_qav_labels_clamped_when_span_overflows():
    padded = np.zeros((1, 8), dtype=np.int32)
    label, mask = qav_labels(padded, prefix_index=6, max_feats=4)
    # only 2 slots fit (reference: base_dataset.py:84-91 range_limit)
    assert label.tolist() == [[-1] * 6 + [0, 1]]


def test_sanitize_clears_placeholders_and_padding():
    padded = np.array([[1, -2, -2, 9, -1]], dtype=np.int32)
    assert sanitize_text_id(padded).tolist() == [[1, 0, 0, 9, 0]]


class TestBuildTextFeatures:
    @pytest.fixture(scope="class")
    def feats(self):
        tok = MockTokenizer()
        return build_text_features(tok, sample_text(), max_feats=10,
                                   max_seq_len=128, split="train",
                                   answer_mapping=ANSWER_MAPPING, answer=2)

    def test_shapes(self, feats):
        for k in ("vqa", "vaq", "qav"):
            assert feats.text_id[k].shape == (1, 128)
            assert feats.label[k].shape == (1, 128)
            assert feats.label_mask[k].shape == (1, 128)
            assert feats.video_index[k].shape == (10,)

    def test_video_placeholders_zeroed_in_text_id(self, feats):
        vs = feats.video_start["vqa"]
        assert (feats.text_id["vqa"][0, vs:vs + 10] == 0).all()

    def test_vqa_supervision_starts_at_prefix(self, feats):
        p = feats.prefix_index["vqa"]
        assert (feats.label["vqa"][0, :p] == 0).all()
        assert feats.label_mask["vqa"][0, p] == 1.0
        # labels on the answer span equal the input ids there
        span = feats.label_mask["vqa"][0].astype(bool)
        assert (feats.label["vqa"][0, span] ==
                feats.text_id["vqa"][0, span]).all()

    def test_qav_video_span_targets(self, feats):
        p = feats.prefix_index["qav"]
        assert (feats.label["qav"][0, p:p + 10] == np.arange(10)).all()
        assert feats.video_start["qav"] == p
        assert (feats.video_index["qav"] == np.arange(p, p + 10)).all()

    def test_val_option_expansion(self):
        tok = MockTokenizer()
        f = build_text_features(tok, sample_text(), max_feats=10,
                                max_seq_len=128, split="val",
                                answer_mapping=ANSWER_MAPPING, answer=0)
        assert f.text_id["vqa"].shape == (5, 128)
        assert f.label["vqa"].shape == (5, 128)


class TestDialogueTruncation:
    def _features(self, n_words, max_seq_len=64):
        tok = MockTokenizer()
        text = PromptText(
            q_text="Question: Which event is more likely to happen right after?\n",
            o_text="Choices: \n(A) he leaves\n(B) he stays\n",
            a_text="Answer: The answer is ",
            d_text="Dialogue: " + " ".join(f"w{i}" for i in range(n_words)) + "\n",
        )
        return tok, build_dialogue_text_features(
            tok, text, max_feats=10, max_seq_len=max_seq_len, split="train",
            answer_mapping={0: "(A)", 1: "(B)"}, answer=0, sub=True)

    def test_short_dialogue_no_truncation(self):
        tok, f = self._features(3)
        assert f.text_id["vqa"].shape[1] == 64
        p = f.prefix_index["vqa"]
        assert f.label_mask["vqa"][0, p] == 1.0

    def test_long_dialogue_middle_truncated(self):
        tok, f = self._features(200)
        seq = f.text_id["vqa"][0]
        # no -1 padding artifacts remain
        assert (seq >= 0).all()
        # vqa prefix is recomputed from the end (reference: vlep.py:90)
        assert f.prefix_index["vqa"] == 64 - 4
        # tail still ends with eos
        assert seq[-1] == tok.eos_id

    def test_long_dialogue_qav_prefix(self):
        tok, f = self._features(200)
        # qav prefix = S - F - 1 (reference: vlep.py:97)
        assert f.prefix_index["qav"] == 64 - 10 - 1
        p = f.prefix_index["qav"]
        assert (f.label["qav"][0, p:p + 10] == np.arange(10)).all()
