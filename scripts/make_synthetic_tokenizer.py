"""Build a synthetic LLaMA-layout ``tokenizer.model`` (no Meta assets).

Reproduces the vocab geometry the framework's prompt anchors assume
(reference: llama/tokenizer.py:28-31): 32,000 pieces with <unk>/<s>/</s> at
0/1/2, the 256 byte-fallback pieces at 3..258 (so newline "<0x0A>" is id 13),
and BPE merge chains placing "▁Video" at 15167, "▁Question" at 16492 and
"▁Answer" at 22550. Everything else tokenizes per character (printable
ASCII as NORMAL pieces) or through byte fallback, so any text encodes and
round-trips. The file is a real SentencePiece ModelProto — loadable by the
sentencepiece runtime or by flipped_tpu.text.spm on images without it.

Usage: python scripts/make_synthetic_tokenizer.py --out /tmp/tok/tokenizer.model
"""
import argparse
import os
import string
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from flipped_tpu.text import spm  # noqa: E402
from flipped_tpu.text.tokenizer import (A_TOKEN_ID, Q_TOKEN_ID,  # noqa: E402
                                        V_TOKEN_ID)

VOCAB = 32000


def build_pieces():
    pieces = [("<unk>", 0.0, spm.UNKNOWN), ("<s>", 0.0, spm.CONTROL),
              ("</s>", 0.0, spm.CONTROL)]
    pieces += [(f"<0x{b:02X}>", 0.0, spm.BYTE) for b in range(256)]
    chars = "▁" + string.ascii_letters + string.digits + string.punctuation
    pieces += [(c, -10.0, spm.NORMAL) for c in chars]

    # anchor merge chains: each prefix concatenation exists, with scores
    # decreasing along the chain so greedy BPE assembles the full word.
    # The anchors appear after "\n" in every prompt, so (as in the real
    # LLaMA vocab) they are the UNPREFIXED pieces — "Answer" not "▁Answer".
    def chain(word):
        return [(word[:k], -1.0 - 0.01 * k, spm.NORMAL)
                for k in range(2, len(word))]

    anchors = {"Video": V_TOKEN_ID, "Question": Q_TOKEN_ID,
               "Answer": A_TOKEN_ID}
    for w in anchors:
        pieces += chain(w)

    # pad with UNUSED fillers, then drop the anchor pieces at their exact ids
    out = list(pieces)
    out += [(f"<fill_{i}>", 0.0, spm.UNUSED)
            for i in range(VOCAB - len(out))]
    for w, idx in anchors.items():
        out[idx] = (w, -1.0 - 0.01 * len(w), spm.NORMAL)
    assert len(out) == VOCAB
    assert len({p for p, _, _ in out}) == VOCAB, "duplicate pieces"
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/flipped_e2e/tok/tokenizer.model")
    args = ap.parse_args()
    data = spm.serialize_model(build_pieces(), spm.BPE,
                               remove_extra_whitespaces=False)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(data)

    m = spm.load_model(args.out)
    for text, want in (("Video", V_TOKEN_ID), ("Question", Q_TOKEN_ID),
                       ("Answer", A_TOKEN_ID), ("\n", 13)):
        ids = spm.encode(m, text)
        assert want in ids, (text, want, ids)
    print(f"wrote {args.out}: {len(m.pieces)} pieces, "
          f"anchors Video={V_TOKEN_ID} Question={Q_TOKEN_ID} "
          f"Answer={A_TOKEN_ID}, newline=13")


if __name__ == "__main__":
    main()
