"""Convert torch .pth feature stores to .npz so the training runtime is
torch-free (torch then remains needed only for the one-time checkpoint and
feature conversions). The data layer reads both formats
(flipped_tpu/data/feature_store.py).

    python scripts/convert_features.py data/nextqa/clipvitl14.pth
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert(path: str, out: str | None = None):
    import torch

    out = out or os.path.splitext(path)[0] + ".npz"
    raw = torch.load(path, map_location="cpu", weights_only=False)
    arrays = {str(k): (v.float().numpy() if hasattr(v, "numpy")
                       else np.asarray(v, np.float32))
              for k, v in raw.items()}
    np.savez(out, **arrays)
    print(f"{path}: {len(arrays)} entries → {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out and len(args.paths) > 1:
        ap.error("--out is ambiguous with multiple inputs — convert one "
                 "file at a time or drop --out for per-file <stem>.npz")
    for p in args.paths:
        convert(p, args.out if len(args.paths) == 1 else None)
