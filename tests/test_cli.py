"""End-to-end trainer CLI tests, in-process on the CPU backend: train → eval
→ best checkpoint → log.txt → resume, for classification and generation
(reference control flow: train.py:78-152)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from flipped_tpu.core.config import get_args_parser


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_data.py", "--root",
         str(root), "--n", "8"], check=True, capture_output=True)
    return str(root)


def run_main(argv):
    from flipped_tpu.cli import train as cli_train
    args = get_args_parser().parse_args(argv)
    return cli_train.main(args)


def test_classification_train_eval_ckpt_resume(synth_root, tmp_path):
    out = str(tmp_path / "out")
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--vaq", "--qav", "--accum_iter", "2", "--dp", "1", "--output_dir", out]
    run_main(argv)
    # JSON-lines log with train + val stats
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert len(lines) == 1
    assert "train_loss" in lines[0] and "val_acc" in lines[0]
    assert np.isfinite(lines[0]["train_loss"])
    assert "val_Total" in lines[0]  # qtype buckets (overall bucket 0)
    # best checkpoint written
    assert os.path.isdir(os.path.join(out, "checkpoint_best"))
    meta = json.load(open(os.path.join(out, "checkpoint_best.meta.json")))
    assert meta["epoch"] == 0

    # resume continues at epoch 1
    run_main(argv + ["--epochs", "2", "--resume", "checkpoint_best"])
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert lines[-1]["epoch"] == 1


def test_generation_task_cli(synth_root, tmp_path):
    out = str(tmp_path / "out_gen")
    argv = ["--model", "tiny", "--dataset", "musicavqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--is_generation_task", "--dp", "1", "--output_dir", out]
    run_main(argv)
    merged = os.path.join(out, "extracted_answers",
                          "extracted_answers_epoch0.json")
    assert os.path.exists(merged)
    answers = json.load(open(merged))
    assert answers and "generated_answer" in answers[0]
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert "val_counting" in lines[0]  # musicavqa qtype buckets


def test_evaluate_cli_from_checkpoint(synth_root, tmp_path):
    out = str(tmp_path / "out_eval")
    base = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--dp", "1", "--output_dir", out]
    run_main(base + ["--epochs", "1", "--warmup_epochs", "0.5",
                     "--blr", "9e-1"])
    from flipped_tpu.cli import evaluate
    args = get_args_parser().parse_args(base + ["--resume",
                                                "checkpoint_best"])
    stats = evaluate.main(args)
    assert "acc" in stats and 0.0 <= stats["acc"] <= 1.0


def test_quantized_cli_trains(synth_root, tmp_path):
    """int8 frozen backbone through the full trainer (synthetic weights)."""
    out = str(tmp_path / "out_q")
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--quantize", "int8", "--dp", "1", "--output_dir", out]
    run_main(argv)
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(lines[0]["train_loss"])


def test_vlep_dialogue_cli(synth_root, tmp_path):
    """Dialogue dataset (--sub) through the full trainer: dvqa/dvaq/dqav
    encoders + middle truncation end to end."""
    out = str(tmp_path / "out_vlep")
    argv = ["--model", "tiny", "--dataset", "vlep", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--sub", "--qav", "--dp", "1", "--output_dir", out]
    run_main(argv)
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(lines[0]["train_loss"])
    assert lines[0]["train_qav_loss"] > 0


def test_audio_sum_cli(synth_root, tmp_path):
    """Audio fusion (sum merge) through the full trainer."""
    out = str(tmp_path / "out_audio")
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--audio", "--audio_merge", "sum", "--dp", "1",
            "--output_dir", out, "--debug"]
    run_main(argv)
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_grain_loader_cli(synth_root, tmp_path):
    out = str(tmp_path / "out_grain")
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--loader", "grain", "--dp", "1", "--output_dir", out, "--debug"]
    run_main(argv)
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_pipeline_parallel_cli(synth_root, tmp_path):
    """--pp 2 through the full trainer on a dp2×pp2 virtual mesh: stacked
    layer params, GPipe schedule, dense eval scorer, stacked-trainables
    checkpoint save → resume (model/pipeline.py)."""
    import jax
    if len(jax.devices("cpu")) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    out = str(tmp_path / "out_pp")
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "4", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--vaq", "--qav", "--dp", "2", "--pp", "2", "--output_dir", out]
    run_main(argv)
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(lines[0]["train_loss"])
    assert "val_acc" in lines[0]
    # resume restores the STACKED trainable/opt trees and continues
    run_main(argv + ["--epochs", "2", "--resume", "checkpoint_last"])
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert lines[-1]["epoch"] == 1


def test_real_tokenizer_cli(synth_root, tmp_path):
    """The full real-tokenizer path: a LLaMA-layout tokenizer.model read by
    text/spm.py (no sentencepiece package) → prompts → masking → one train
    step ('small' = real 32k vocab; S 384 since per-char fallback runs
    long). Reference flow: llama/tokenizer.py:14-42 + train.py:78-152."""
    tok_dir = tmp_path / "tok"
    tok_dir.mkdir()
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_tokenizer.py", "--out",
         str(tok_dir / "tokenizer.model")], check=True, capture_output=True)
    out = str(tmp_path / "out_tok")
    argv = ["--model", "small", "--dataset", "nextqa", "--data_root",
            synth_root, "--batch_size", "2", "--max_seq_len", "384",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--vaq", "--qav", "--tokenizer_path",
            str(tok_dir / "tokenizer.model"), "--dp", "1",
            "--output_dir", out, "--debug"]
    run_main(argv)
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert np.isfinite(lines[0]["train_loss"])  # in-vocab ids, no OOB NaN
