"""scripts/analyze_trace.py on a synthetic chrome-trace capture.

The analyzer must (a) attribute busy time from the 'XLA Ops' leaf row only
(the 'Steps'/'XLA Modules' rows envelop the same time and would double
count), (b) take the wall span from the 'Steps' row, and (c) categorize
Pallas attention kernels / fusions / copies correctly.
"""
import gzip
import json
import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir,
                      "scripts", "analyze_trace.py")


def _write_trace(root, events):
    d = os.path.join(root, "plugins", "profile", "run1")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)


def _meta(pid, tid, kind, name):
    e = {"ph": "M", "pid": pid, "name": kind, "args": {"name": name}}
    if tid is not None:
        e["tid"] = tid
    return e


def _op(pid, tid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": tid, "name": name,
            "ts": ts, "dur": dur}


def test_device_rollup(tmp_path):
    ev = [
        _meta(3, None, "process_name", "/device:TPU:0"),
        _meta(3, 1, "thread_name", "Steps"),
        _meta(3, 2, "thread_name", "XLA Modules"),
        _meta(3, 3, "thread_name", "XLA Ops"),
        _meta(701, None, "process_name", "/host:CPU"),
        # two steps of 100us wall each; module row envelops everything
        _op(3, 1, "0", 0, 100), _op(3, 1, "1", 100, 100),
        _op(3, 2, "jit_train_step(123)", 0, 200),
        # leaf ops: 60us attention + 30us fusion + 10us copy per step
        _op(3, 3, "attention.4", 0, 60),
        _op(3, 3, "fusion.7", 60, 30),
        _op(3, 3, "copy.1", 90, 10),
        _op(3, 3, "attention.4", 100, 60),
        _op(3, 3, "fusion.7", 160, 30),
        _op(3, 3, "copy.1", 190, 10),
        # host event must be ignored
        _op(701, 9, "python_overhead", 0, 500),
    ]
    _write_trace(tmp_path, ev)
    out = subprocess.run([sys.executable, SCRIPT, str(tmp_path)],
                         capture_output=True, text=True, check=True).stdout
    # busy = 200us of leaf ops over a 200us Steps span — NOT 400us
    # (module row double count), NOT 700us (host event)
    assert "device leaf ops: 6, steps: 2, busy 0.200 ms over a 0.200 ms" in out
    assert "100.0% busy" in out
    # category attribution: attention 60%, fusion 30%, copy 10%
    assert "attention_kernel" in out and "60.0%" in out
    assert "other_fusion" in out and "30.0%" in out
    assert "copy" in out and "10.0%" in out


def test_no_device_plane(tmp_path):
    ev = [
        _meta(701, None, "process_name", "/host:CPU"),
        _op(701, 9, "python", 0, 500),
    ]
    _write_trace(tmp_path, ev)
    out = subprocess.run([sys.executable, SCRIPT, str(tmp_path)],
                         capture_output=True, text=True, check=True).stdout
    assert "NO DEVICE PLANE" in out
