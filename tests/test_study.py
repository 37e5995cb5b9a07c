"""Regression test for the int8 parity study tool (scripts/ — the evidence
generator for the quantization defaults): phases run, artifacts land, and
the report compares each phase against the right baseline (rotated phases
vs the bf16r reparametrization control)."""
import json
import runpy
import sys
from pathlib import Path

import pytest

SCRIPT = str(Path(__file__).resolve().parent.parent / "scripts"
             / "int8_parity_study.py")


def _run(argv):
    old = sys.argv
    sys.argv = ["int8_parity_study.py"] + argv
    try:
        runpy.run_path(SCRIPT, run_name="__main__")
    finally:
        sys.argv = old


@pytest.mark.parametrize("mode", ["eval", "train"])
def test_study_rotation_phases_and_report(tmp_path, mode):
    base = ["--preset", "tiny", "--batch", "2", "--steps", "2",
            "--weights", "outlier", "--out", str(tmp_path), "--mode", mode]
    for phase in ("bf16", "bf16r", "w8a8", "w8a8r"):
        _run(["--phase", phase] + base)
    prefix = "train" if mode == "train" else "scores"
    for phase in ("bf16", "bf16r", "w8a8", "w8a8r"):
        assert (tmp_path / f"{prefix}_{phase}_outlier.npz").exists()

    _run(["--phase", "report"] + base)
    name = "report_train.json" if mode == "train" else "report.json"
    rep = json.loads((tmp_path / name).read_text())["outlier"]
    # rotated phases compare against the rotated-unquantized control;
    # unrotated phases against plain bf16
    assert rep["w8a8r"].get("baseline") == "bf16r"
    assert rep["bf16r"].get("baseline") is None
    assert rep["w8a8"].get("baseline") is None
    if mode == "eval":
        for ph in ("w8a8", "w8a8r", "bf16r"):
            assert 0.0 <= rep[ph]["argmin_flip_rate"] <= 1.0
            assert rep[ph]["n_examples"] == 4
    else:
        for ph in ("w8a8", "w8a8r", "bf16r"):
            assert rep[ph]["loss_abs_delta_mean"] >= 0.0
        assert rep["n_steps"] == 2
