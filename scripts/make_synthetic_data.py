"""Generate synthetic dataset fixtures shaped like the reference's artifacts
(CSV/JSON/JSONL + clipvitl14.pth feature dicts) so the full pipeline runs
without the real benchmarks. Usage:

    python scripts/make_synthetic_data.py --root ./data --n 32
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flipped_tpu.data.batching import _WORDS as WORDS  # noqa: E402
# one shared vocabulary with make_synthetic_items, so CSV fixtures match
# the synthetic-item generator (and MockTokenizer coverage) by construction


def _features(path, vids, n_frames=16, dim=768, seed=0):
    import torch
    rs = np.random.RandomState(seed)
    torch.save({v: torch.tensor(rs.randn(n_frames, dim).astype(np.float32))
                for v in vids}, path)


def _audio(path, vids, n=10, dim=1024, seed=1):
    import torch
    rs = np.random.RandomState(seed)
    torch.save({v: torch.tensor(rs.randn(n, dim).astype(np.float32))
                for v in vids}, path)


def make_nextqa(root, n, rs):
    d = os.path.join(root, "nextqa")
    os.makedirs(d, exist_ok=True)
    qtypes = ["CH", "CW", "TN", "TC", "TP", "DL", "DC", "DO"]
    for split, count in (("train", n), ("val", max(n // 4, 2))):
        rows = ["video,type,answer,question,a0,a1,a2,a3,a4"]
        for i in range(count):
            opts = ",".join(rs.choice(WORDS) for _ in range(5))
            rows.append(f"vid{i % n},{rs.choice(qtypes)},{rs.randint(5)},"
                        f"what does the {rs.choice(WORDS)} do,{opts}")
        with open(os.path.join(d, f"{split}.csv"), "w") as f:
            f.write("\n".join(rows))
    vids = [f"vid{i}" for i in range(n)]
    _features(os.path.join(d, "clipvitl14.pth"), vids)
    _audio(os.path.join(d, "audio_imagebind.pth"), vids)
    _audio(os.path.join(d, "audio_imagebind_clip.pth"), vids, n=1)


def make_musicavqa(root, n, rs):
    d = os.path.join(root, "musicavqa")
    os.makedirs(d, exist_ok=True)
    types = [["Audio", "Counting"], ["Visual", "Temporal"],
             ["Audio-Visual", "Existential"]]
    for split, count in (("train", n), ("val", max(n // 4, 2))):
        data = [dict(video_id=f"mv{i % n}",
                     question_content="How many <Object> are there",
                     anser=str(rs.choice(WORDS)),
                     templ_values=f"['{rs.choice(WORDS)}s']",
                     type=str(types[i % 3]).replace('"', "'"))
                for i in range(count)]
        with open(os.path.join(d, f"avqa-{split}.json"), "w") as f:
            json.dump(data, f)
    vids = [f"mv{i}" for i in range(n)]
    _features(os.path.join(d, "clipvitl14.pth"), vids)
    _audio(os.path.join(d, "audio_imagebind.pth"), vids)
    _audio(os.path.join(d, "audio_imagebind_clip.pth"), vids, n=1)


def make_vlep(root, n, rs):
    d = os.path.join(root, "vlep")
    os.makedirs(d, exist_ok=True)
    for split, count in (("train", n), ("dev", max(n // 4, 2))):
        data = [dict(vid_name=f"vl{i % n}",
                     events=[f"{rs.choice(WORDS)} happens",
                             f"{rs.choice(WORDS)} stops"],
                     answer=int(rs.randint(2)), ts=[0.0, 6.0])
                for i in range(count)]
        with open(os.path.join(d, f"vlep_{split}_release.jsonl"), "w") as f:
            f.write("\n".join(json.dumps(x) for x in data))
    subs = [dict(vid_name=f"vl{i}",
                 sub=[dict(start=0, end=4,
                           text=" ".join(rs.choice(WORDS, 8)))])
            for i in range(n)]
    with open(os.path.join(d, "vlep_subtitles.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(x) for x in subs))
    _features(os.path.join(d, "clipvitl14.pth"), [f"vl{i}" for i in range(n)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./data")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    rs = np.random.RandomState(args.seed)
    make_nextqa(args.root, args.n, rs)
    make_musicavqa(args.root, args.n, rs)
    make_vlep(args.root, args.n, rs)
    print(f"synthetic data written under {args.root}")


if __name__ == "__main__":
    main()
