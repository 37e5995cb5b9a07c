"""Summarize a jax.profiler trace into a device-op time breakdown.

Consumes the trace.json.gz written under `<dir>/plugins/profile/<run>/` by
`bench.py --trace_dir <dir>` (or any jax.profiler.start_trace capture) and
prints, per device plane: total busy time, the top ops, and a category
rollup (matmul / attention-kernel / elementwise-fusion / convert-quant /
copy / reduce / other) — the attribution evidence for docs/PERF.md
("where does the non-MXU time go", round-2 verdict weak #2).

Usage:
    python scripts/analyze_trace.py /tmp/trace_w8a8 [--top 25]

If the capture contains no device plane (this environment's TPU relay may
execute remotely without returning device events), the script says so
explicitly instead of mislabeling host python time as device time.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

CATEGORIES = (
    # Pallas kernels are named explicitly at their pallas_call sites
    # (model/pallas/*.py `name=`): quant matmuls must match BEFORE the
    # attention bucket, and a bare custom-call with neither name goes to
    # its own bucket instead of being misattributed to attention.
    ("quant_matmul_kernel",
     re.compile(r"quant_matmul|int4_matmul|quant_dx|int4_dx", re.I)),
    ("attention_kernel", re.compile(r"flash|_stream_|attention", re.I)),
    ("custom_call_other", re.compile(r"pallas|custom-call|tpu_custom_call", re.I)),
    # quant_convert BEFORE matmul: 'convert.N' must not substring-match a
    # matmul pattern ('conv'), and this workload has no convolutions
    ("quant_convert", re.compile(r"convert|reduce-precision|round|clamp|quant", re.I)),
    ("matmul", re.compile(r"dot|matmul|convolution", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce|psum", re.I)),
    ("copy", re.compile(r"copy|transpose|reshape|bitcast|concatenate|dynamic-slice|dynamic-update|pad|slice", re.I)),
    ("softmax_exp", re.compile(r"exp|softmax|log|tanh|rsqrt|divide", re.I)),
    ("loop_overhead", re.compile(r"while|condition|tuple|parameter|infeed|outfeed", re.I)),
)


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other_fusion" if "fusion" in name else "other"


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        sys.exit(f"no trace.json.gz under {trace_dir}/plugins/profile/*/")
    path = paths[-1]
    print(f"# {path}", file=sys.stderr)
    data = json.load(gzip.open(path))
    return data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--category", default="",
                    help="restrict the top-op list to one rollup category "
                         "(e.g. 'copy'), and group its ops by name prefix "
                         "(copy.N → copy) — how the copy bucket gets "
                         "chased to named op families, docs/PERF.md")
    args = ap.parse_args()

    events = load_events(args.trace_dir)

    # 'M' metadata events name the processes (planes); device planes are
    # "/device:TPU:N" (or contain 'TPU'/'GPU'); host python planes are
    # "/host:..." or python threads
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")

    device_pids = {pid for pid, n in pid_names.items()
                   if re.search(r"TPU|GPU|device", n, re.I)
                   and not re.search(r"host", n, re.I)}
    print("planes:", {pid: n for pid, n in pid_names.items()})
    if not device_pids:
        print("\nNO DEVICE PLANE in this capture — only host-side events "
              "were recorded (on this environment's remote-execution relay "
              "device traces may be unavailable). Use ablation benchmarks "
              "for attribution instead.")
        return

    # Device planes carry nested rows: 'Steps' and 'XLA Modules' are
    # CONTAINER rows that envelop the leaf-op timeline — counting them
    # double-counts every op. Attribute busy time from the 'XLA Ops' row
    # only; take the wall span from the 'Steps' row when present.
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    op_rows = {k for k, n in thread_names.items()
               if k[0] in device_pids and n in ("XLA Ops", "Async XLA Ops")}
    step_rows = {k for k, n in thread_names.items()
                 if k[0] in device_pids and n == "Steps"}

    per_op = collections.Counter()
    per_cat = collections.Counter()
    n_ev = 0
    t_min, t_max = float("inf"), 0.0
    s_min, s_max = float("inf"), 0.0
    n_steps = 0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        key = (e.get("pid"), e.get("tid"))
        dur = float(e.get("dur", 0.0))  # microseconds
        ts = float(e.get("ts", 0.0))
        if key in step_rows:
            s_min, s_max = min(s_min, ts), max(s_max, ts + dur)
            n_steps += 1
            continue
        if op_rows and key not in op_rows:
            continue
        name = e.get("name", "?")
        per_op[name] += dur
        per_cat[categorize(name)] += dur
        t_min, t_max = min(t_min, ts), max(t_max, ts + dur)
        n_ev += 1

    busy = sum(per_op.values())
    span = max((s_max - s_min) if n_steps else (t_max - t_min), 1e-9)
    print(f"\ndevice leaf ops: {n_ev}"
          + (f", steps: {n_steps}" if n_steps else "")
          + f", busy {busy/1e3:.3f} ms over a "
          f"{span/1e3:.3f} ms span → {100*busy/span:.1f}% busy "
          f"({100*(1-busy/span):.1f}% gaps/idle)")
    if n_steps:
        print(f"per-step: busy {busy/n_steps/1e3:.3f} ms, "
              f"span {span/n_steps/1e3:.3f} ms")

    print("\n== category rollup ==")
    for cat, d in per_cat.most_common():
        print(f"  {cat:18s} {d/1e3:10.3f} ms  {100*d/busy:5.1f}%")

    if args.category:
        # group the category's ops by HLO name family (strip .N suffixes):
        # 11k distinct copy.N instructions collapse to a handful of families
        fam_d, fam_n = collections.Counter(), collections.Counter()
        for name, d in per_op.items():
            if categorize(name) != args.category:
                continue
            fam = re.sub(r"[.\d]+$", "", name)
            fam_d[fam] += d
            fam_n[fam] += 1
        print(f"\n== '{args.category}' op families ==")
        denom = max(n_steps, 1)
        for fam, d in fam_d.most_common(args.top):
            # fam_n = distinct HLO instructions (each fires ~once per step)
            print(f"  {d/1e3/denom:9.3f} ms/step  n={fam_n[fam]:6d}  {fam}")
        return

    print(f"\n== top {args.top} ops ==")
    for name, d in per_op.most_common(args.top):
        print(f"  {d/1e3:10.3f} ms  {100*d/busy:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
