"""Tests for the int8 parity study tool (scripts/ — the evidence generator
for the quantization defaults): unit tests of the ensemble generators,
flip/margin metrics, phase plumbing and synthesis cache (round-3 verdict,
weak #6: the evidence pipeline must itself be tested code), plus the
end-to-end phase/report regression."""
import importlib.util
import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPT = str(Path(__file__).resolve().parent.parent / "scripts"
             / "int8_parity_study.py")


@pytest.fixture(scope="module")
def study():
    """Import the study script as a module (unit-test surface)."""
    spec = importlib.util.spec_from_file_location("int8_parity_study", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_frozen(d: int, hf: int):
    """Minimal frozen tree with one residual reader (wq: rows in residual
    space) and one writer (wo: cols in residual space)."""
    return {"layers_0": {"attention": {
        "wq": {"kernel": np.zeros((d, d), np.float32)},
        "wo": {"kernel": np.zeros((hf, d), np.float32)}}}}


def _leaves(tree):
    a = tree["layers_0"]["attention"]
    return a["wq"], a["wo"]


class TestSynthesizeEnsembles:
    D, HF = 64, 96

    def _synth(self, study, dist, quantize=False, rot=None, seed=5):
        return study._synthesize_frozen(
            _fake_frozen(self.D, self.HF), seed=seed, quantize=quantize,
            dist=dist, model_dim=self.D, group=0, outliers=False, rot=rot)

    def test_deterministic_across_calls(self, study):
        for dist in study.DISTS:
            a, _ = _leaves(self._synth(study, dist))
            b, _ = _leaves(self._synth(study, dist))
            np.testing.assert_array_equal(np.asarray(a["kernel"]),
                                          np.asarray(b["kernel"]))

    def test_gaussian_fan_in_scaled(self, study):
        wq, wo = _leaves(self._synth(study, "gaussian"))
        # fan-in scaling: std ≈ 1/sqrt(fan_in)
        assert abs(np.asarray(wq["kernel"], np.float32).std()
                   - 1 / np.sqrt(self.D)) < 0.2 / np.sqrt(self.D)
        assert abs(np.asarray(wo["kernel"], np.float32).std()
                   - 1 / np.sqrt(self.HF)) < 0.2 / np.sqrt(self.HF)

    def test_student_t_variance_normalized(self, study):
        wq, _ = _leaves(self._synth(study, "student_t"))
        w = np.asarray(wq["kernel"], np.float32)
        # df=4 t has variance 2, divided out — same scale as gaussian, but
        # heavier tails (max |entry| well beyond the gaussian envelope)
        assert abs(w.std() - 1 / np.sqrt(self.D)) < 0.3 / np.sqrt(self.D)
        assert np.abs(w).max() > 4.0 * w.std()

    def test_outlier_amplifies_exactly_the_chosen_dims(self, study):
        """The outlier ensemble = the gaussian draw with ONE global set of
        residual dims amplified 10–30× in every reader's input rows and
        every writer's output cols — recompute the dims/factors from the
        documented seed derivation and verify the amplification pattern."""
        g_wq, g_wo = _leaves(self._synth(study, "gaussian"))
        o_wq, o_wo = _leaves(self._synth(study, "outlier"))
        g_wq, g_wo, o_wq, o_wo = (np.asarray(x["kernel"], np.float32)
                                  for x in (g_wq, g_wo, o_wq, o_wo))

        o_rs = np.random.RandomState(5 + 7919)  # seed + 7919, same each phase
        n_o = max(1, int(study.OUTLIER_FRAC * self.D))
        dims = np.sort(o_rs.choice(self.D, size=n_o, replace=False))
        fac = o_rs.uniform(*study.OUTLIER_RANGE, size=n_o).astype(np.float32)

        np.testing.assert_allclose(o_wq[dims, :], g_wq[dims, :] * fac[:, None],
                                   rtol=1e-2)  # bf16 cast of the product
        np.testing.assert_allclose(o_wo[:, dims], g_wo[:, dims] * fac[None, :],
                                   rtol=1e-2)
        keep = np.setdiff1d(np.arange(self.D), dims)
        np.testing.assert_array_equal(o_wq[keep, :], g_wq[keep, :])
        np.testing.assert_array_equal(o_wo[:, keep], g_wo[:, keep])
        assert ((fac >= study.OUTLIER_RANGE[0])
                & (fac <= study.OUTLIER_RANGE[1])).all()

    def test_rotation_folds_before_quantization(self, study):
        """rot folds Rᵀ·W into readers and W·R into writers BEFORE the bf16
        cast — the rotated phase is the same model reparametrized."""
        from flipped_tpu.ckpt.rotate import Rotation

        rot = Rotation(self.D, seed=study.ROTATION_SEED)
        g_wq, g_wo = _leaves(self._synth(study, "gaussian"))
        r_wq, r_wo = _leaves(self._synth(study, "gaussian", rot=rot))
        # recover the pre-cast f32 draw by re-deriving it: identical rs
        # consumption order means gaussian and gaussian+rot share the draw
        import ml_dtypes
        want_wq = rot.left_t(np.asarray(g_wq["kernel"], np.float32))
        want_wo = rot.right(np.asarray(g_wo["kernel"], np.float32))
        # both sides then cast bf16 — but g_* were ALREADY cast, so compare
        # loosely (one bf16 rounding of the rotation input)
        np.testing.assert_allclose(np.asarray(r_wq["kernel"], np.float32),
                                   want_wq, rtol=2e-2, atol=1e-3)
        np.testing.assert_allclose(np.asarray(r_wo["kernel"], np.float32),
                                   want_wo, rtol=2e-2, atol=1e-3)

    def test_quantized_leaves(self, study):
        wq, _ = _leaves(self._synth(study, "gaussian", quantize=True))
        assert set(wq) == {"kernel_q", "scale"}
        assert np.asarray(wq["kernel_q"]).dtype == np.int8
        assert np.asarray(wq["scale"]).dtype == np.float32
        scale = np.asarray(wq["scale"])
        deq = np.asarray(wq["kernel_q"], np.float32) * scale[None, :]
        base, _ = _leaves(self._synth(study, "gaussian"))
        # absmax rounding: elementwise error ≤ half the channel's scale
        err = np.abs(deq - np.asarray(base["kernel"], np.float32))
        assert (err <= 0.5 * scale[None, :] + 1e-7).all(), err.max()


class TestCompareMetrics:
    def test_exact_on_hand_built_scores(self, study):
        bf = {"scores": np.array([[1.0, 2.0, 3.0],     # pred 0, margin 1.0
                                  [2.0, 1.9, 5.0],     # pred 1, margin 0.1
                                  [4.0, 0.5, 0.75]]),  # pred 1, margin 0.25
              "answers": np.array([0, 1, 1])}
        q8 = {"scores": np.array([[1.0, 2.0, 3.0],     # pred 0 (no flip)
                                  [2.0, 2.05, 5.0],    # pred 0 (FLIP)
                                  [4.0, 0.5, 0.75]]),  # pred 1 (no flip)
              "answers": bf["answers"]}
        out = study._compare(bf, q8)
        assert out["n_examples"] == 3 and out["n_options"] == 3
        assert out["n_flips"] == 1
        assert out["argmin_flip_rate"] == pytest.approx(1 / 3)
        assert out["score_delta_max"] == pytest.approx(0.15)
        assert out["score_delta_mean"] == pytest.approx(0.15 / 9)
        assert out["max_flipped_margin"] == pytest.approx(0.1)
        assert out["bf16_margin_median"] == pytest.approx(0.25)
        assert out["accuracy_bf16"] == pytest.approx(1.0)     # all correct
        assert out["accuracy_quant"] == pytest.approx(2 / 3)  # row 1 flipped
        assert out["stability_margin_bound"] == pytest.approx(0.3)
        # only row 0 (margin 1.0) clears the 0.3 bound; rows 1 (0.1) and
        # 2 (0.25) sit below it
        assert out["frac_examples_above_bound"] == pytest.approx(1 / 3)

    def test_stability_bound_is_sound(self, study):
        """Property: NO example whose bf16 margin exceeds the published
        bound 2·max|Δscore| can flip — on random score perturbations."""
        rs = np.random.RandomState(0)
        s = rs.randn(512, 5)
        d = rs.randn(512, 5) * 0.05
        bf = {"scores": s, "answers": rs.randint(0, 5, 512)}
        q8 = {"scores": s + d, "answers": bf["answers"]}
        out = study._compare(bf, q8)
        srt = np.sort(s, -1)
        margin = srt[:, 1] - srt[:, 0]
        flips = s.argmin(-1) != (s + d).argmin(-1)
        assert not flips[margin > out["stability_margin_bound"]].any()
        assert out["max_flipped_margin"] <= out["stability_margin_bound"]


class TestPhasePlumbing:
    def test_flags_for(self, study):
        import argparse
        mk = lambda ph: argparse.Namespace(phase=ph)
        assert not study._flags_for(mk("bf16"))["quantized"]
        bf16r = study._flags_for(mk("bf16r"))
        assert bf16r["rotated"] and not bf16r["quantized"]
        w8a8r = study._flags_for(mk("w8a8r"))
        assert w8a8r["rotated"] and w8a8r["quantized"] and w8a8r["act_quant"]
        w4a8 = study._flags_for(mk("w4a8"))
        assert w4a8.get("weight_bits", 8) == 4 and w4a8["act_quant"]
        g = study._flags_for(mk("int8g"))
        assert g["quant_group"] > 0 and not g["act_quant"]

    def test_sfx_keeps_gaussian_files_in_place(self, study):
        import argparse
        assert study._sfx(argparse.Namespace(weights="gaussian")) == ""
        assert study._sfx(argparse.Namespace(weights="outlier")) == "_outlier"

    def test_cache_roundtrip_including_bf16(self, study, tmp_path):
        import ml_dtypes
        c = study._SynthCache(str(tmp_path / "c"))
        assert not c.loading
        a = np.arange(6, dtype=np.float32).reshape(2, 3)
        b = (np.arange(4, dtype=np.float32) / 3).astype(ml_dtypes.bfloat16)
        c.save("layers_0/attention/wq/kernel_q", a)
        c.save("layers_0/attention/wq/scale", b)
        c.finish()
        c2 = study._SynthCache(str(tmp_path / "c"))
        assert c2.loading  # MANIFEST is the completeness marker
        np.testing.assert_array_equal(
            c2.load("layers_0/attention/wq/kernel_q"), a)
        got = c2.load("layers_0/attention/wq/scale")
        assert got.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(got.astype(np.float32),
                                      b.astype(np.float32))
        assert c2.keys_under("layers_0/attention/wq") == [
            "layers_0/attention/wq/kernel_q", "layers_0/attention/wq/scale"]
        assert c2.keys_under("layers_0/attention/wo") == []


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
