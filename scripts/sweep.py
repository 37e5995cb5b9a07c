"""Hyperparameter sweep runner.

TPU-native replacement of the reference's SLURM array sweep
(reference: submit_job.sh:13-24 + train_script.sh:14-29 + params.txt): each
row of a params file is one configuration; select a row with --row (the
equivalent of SLURM_ARRAY_TASK_ID, e.g. from an XPK/queued-resource index or
a plain shell loop) or run all rows sequentially.

Row format (whitespace-separated, like the reference's params.txt):
    <audio:0|1> <audio_only:0|1> <audio_merge:none|sum|concat|attention> \
    <model> <dataset> <blr> [extra CLI flags...]
"""
from __future__ import annotations

import argparse
import shlex
import subprocess
import sys


def row_to_args(row: str):
    parts = row.split()
    audio, audio_only, merge, model, dataset, blr = parts[:6]
    args = ["--model", model, "--dataset", dataset, "--blr", blr]
    if audio == "1":
        args.append("--audio")
    if audio_only == "1":
        args.append("--audio_only")
    if merge != "none":
        args += ["--audio_merge", merge]
    args += parts[6:]
    return args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="scripts/params.txt")
    ap.add_argument("--row", type=int, default=None,
                    help="0-based row index (like SLURM_ARRAY_TASK_ID)")
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("extra", nargs="*", help="flags appended to every run")
    args = ap.parse_args()

    with open(args.params) as f:
        rows = [r.strip() for r in f
                if r.strip() and not r.lstrip().startswith("#")]
    selected = rows if args.row is None else [rows[args.row]]
    for i, row in enumerate(selected):
        idx = args.row if args.row is not None else i
        cli = ([sys.executable, "-m", "flipped_tpu.cli.train"]
               + row_to_args(row) + list(args.extra)
               + ["--output_dir", f"./output_dir/sweep_{idx:03d}"])
        print("run:", " ".join(shlex.quote(c) for c in cli))
        if not args.dry_run:
            subprocess.run(cli, check=True)


if __name__ == "__main__":
    main()
