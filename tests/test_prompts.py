"""Golden-structure tests for the prompt encoders (reference semantics:
llama/tokenizer.py:44-303)."""
import numpy as np
import pytest

from flipped_tpu.text import (A_TOKEN_ID, NL_ID, Q_TOKEN_ID, V_TOKEN_ID,
                              MockTokenizer, PromptText, VIDEO_PLACEHOLDER,
                              encode_dqav, encode_dvaq, encode_dvqa,
                              encode_qav, encode_vaq, encode_vqa)

ANSWER_MAPPING = {0: "(A)", 1: "(B)", 2: "(C)", 3: "(D)", 4: "(E)"}


def nextqa_text():
    options = ["run", "jump", "swim", "fly", "sleep"]
    o_text = "Choices: \n" + "".join(
        f"{ANSWER_MAPPING[i]} {options[i]}\n" for i in range(5))
    return PromptText(
        q_text="Question: What does the dog do?\n",
        o_text=o_text,
        a_text="Answer: The answer is ",
        options=options,
    )


@pytest.fixture(scope="module")
def tok():
    return MockTokenizer()


class TestVQA:
    def test_train_structure(self, tok):
        t, prefix, video_start = encode_vqa(
            tok, nextqa_text(), max_feats=10, split="train",
            answer_mapping=ANSWER_MAPPING, answer=2)
        assert len(t) == 1
        seq = t[0]
        assert seq[0] == tok.bos_id
        assert seq[-1] == tok.eos_id
        # video placeholders occupy [video_start, video_start+10), then newline
        assert seq[video_start:video_start + 10] == [VIDEO_PLACEHOLDER] * 10
        assert seq[video_start + 10] == NL_ID
        # prefix = "Answer" anchor + 5 → just past ": The answer is"
        assert seq[prefix - 5] == A_TOKEN_ID
        # the answer span contains the letter of option C
        answer_span = seq[prefix:]
        assert tok.encode_raw("(C)")[0] in answer_span

    def test_val_expands_options(self, tok):
        t, prefix, video_start = encode_vqa(
            tok, nextqa_text(), max_feats=10, split="val",
            answer_mapping=ANSWER_MAPPING, answer=1)
        assert len(t) == 5
        # all candidates share the identical prompt up to the answer span
        for seq in t:
            assert seq[:prefix] == t[0][:prefix]
        # candidates differ in the answer span
        assert t[0][prefix:] != t[1][prefix:]
        assert t[1][prefix - 5] == A_TOKEN_ID

    def test_generation_variant_drops_options_text(self, tok):
        text = nextqa_text()
        t, prefix, _ = encode_vqa(tok, text, split="train",
                                  answer_mapping=ANSWER_MAPPING, answer=0,
                                  generation=True)
        # generation prompt has no "Choices:" block
        choices_id = tok.encode_raw("Choices")[0]
        assert choices_id not in t[0]
        assert t[0][prefix - 5] == A_TOKEN_ID


class TestVAQ:
    def test_train_structure(self, tok):
        t, prefix, video_start = encode_vaq(
            tok, nextqa_text(), split="train",
            answer_mapping=ANSWER_MAPPING, answer=0)
        seq = t[0]
        assert seq[0] == tok.bos_id
        assert seq[video_start:video_start + 10] == [VIDEO_PLACEHOLDER] * 10
        # prefix = "Question" anchor + 2 → the question body
        assert seq[prefix - 2] == Q_TOKEN_ID
        # question comes AFTER options+answer in VAQ ordering
        assert prefix > video_start + 10

    def test_val_prefix_follows_selected_answer(self, tok):
        # options of different token lengths shift the question span
        text = nextqa_text()
        text.options = ["a", "bb cc dd ee", "f", "g", "h"]
        text.o_text = "Choices: \n" + "".join(
            f"{ANSWER_MAPPING[i]} {text.options[i]}\n" for i in range(5))
        t, prefix, _ = encode_vaq(tok, text, split="val",
                                  answer_mapping=ANSWER_MAPPING, answer=3)
        assert t[3][prefix - 2] == Q_TOKEN_ID


class TestQAV:
    def test_train_structure(self, tok):
        t, prefix = encode_qav(tok, nextqa_text(), split="train",
                               answer_mapping=ANSWER_MAPPING, answer=4)
        seq = t[0]
        assert seq[0] == tok.bos_id
        assert seq[-1] == tok.eos_id
        # the 10 video placeholders are the suffix, right before eos
        assert seq[-11:-1] == [VIDEO_PLACEHOLDER] * 10
        # prefix = "Video" anchor + 2 → first placeholder position
        assert seq[prefix - 2] == V_TOKEN_ID
        assert seq[prefix] == VIDEO_PLACEHOLDER
        assert prefix == len(seq) - 11

    def test_val_expands_options(self, tok):
        t, prefix = encode_qav(tok, nextqa_text(), split="val",
                               answer_mapping=ANSWER_MAPPING, answer=0)
        assert len(t) == 5
        for seq in t:
            assert seq[-11:-1] == [VIDEO_PLACEHOLDER] * 10


class TestDialogue:
    def _text(self, n_dialogue_words=5):
        text = nextqa_text()
        text.options = text.options[:2]
        text.o_text = "Choices: \n(A) run\n(B) jump\n"
        text.d_text = "Dialogue: " + " ".join(
            f"word{i}" for i in range(n_dialogue_words)) + "\n"
        return text

    def test_dvqa_spans(self, tok):
        mapping = {0: "(A)", 1: "(B)"}
        t, prefix, video_start, prefix_i, prefix_main = encode_dvqa(
            tok, self._text(), split="train", answer_mapping=mapping, answer=0)
        seq = t[0]
        assert seq[video_start:video_start + 10] == [VIDEO_PLACEHOLDER] * 10
        # prefix_i = end of video block (+nl), prefix_main = end of dialogue
        assert prefix_i == video_start + 10 + 1
        d_len = len(tok.encode_raw(self._text().d_text))
        assert prefix_main == prefix_i + d_len
        # dvqa prefix counts from the end: answer span = last 4 incl eos
        assert prefix == len(seq) - 4

    def test_dvaq_prefix_anchor(self, tok):
        mapping = {0: "(A)", 1: "(B)"}
        t, prefix, *_ = encode_dvaq(tok, self._text(), split="train",
                                    answer_mapping=mapping, answer=1)
        assert t[0][prefix - 2] == Q_TOKEN_ID

    def test_dqav_layout(self, tok):
        mapping = {0: "(A)", 1: "(B)"}
        t, prefix, prefix_i, prefix_q = encode_dqav(
            tok, self._text(), split="train", answer_mapping=mapping, answer=0)
        seq = t[0]
        assert seq[-11:-1] == [VIDEO_PLACEHOLDER] * 10
        assert prefix == len(seq) - 10 - 1
        # instruction head then dialogue
        assert prefix_q - prefix_i == len(tok.encode_raw(self._text().d_text))


def test_mock_tokenizer_is_deterministic():
    a, b = MockTokenizer(), MockTokenizer()
    s = "Question: Why does determinism matter?\nAnswer: The answer is (A)"
    assert a.encode_raw(s) == b.encode_raw(s)
    assert a.encode_raw("Video")[0] == V_TOKEN_ID
    assert a.encode_raw("Answer")[0] == A_TOKEN_ID
    assert a.encode_raw("\n")[0] == NL_ID
