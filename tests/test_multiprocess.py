"""Real multi-process (2 JAX processes) integration test of the trainer CLI.

The TPU-native analog of the reference's torchrun multi-GPU bring-up
(reference: util/misc.py:220-250 + train.py:116 DDP): two OS processes join
one jax.distributed runtime over a local coordinator, build a global dp=2
mesh (one virtual CPU device per process), and run a debug-length train +
val epoch end-to-end. Asserts: launcher discovery, per-process loader
sharding, cross-process metric sync, single merged log + checkpoint.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


DRIVER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from flipped_tpu.core.config import get_args_parser
from flipped_tpu.cli.train import main

args = get_args_parser().parse_args(sys.argv[1:])
best_acc = main(args)

# post-run shard probe: this process must see only ITS slice of the data
from flipped_tpu.core.config import run_config_from_args
from flipped_tpu.data.pipeline import load_data
from flipped_tpu.text import MockTokenizer

run_cfg = run_config_from_args(args)
loader = load_data(run_cfg.data, MockTokenizer(), "train")
sys.stdout.write(
    f"PROBE process={jax.process_index()}/{jax.process_count()} "
    f"train_batches={len(loader)} best_acc={best_acc}\n")
sys.stdout.flush()
"""


@pytest.fixture(scope="module")
def synth_root16(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_data")
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_data.py", "--root",
         str(root), "--n", "16"], check=True, capture_output=True, cwd=REPO)
    return str(root)


def test_two_process_train(synth_root16, tmp_path):
    out = str(tmp_path / "out_mp")
    port = _free_port()
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root16, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--vaq", "--qav", "--dp", "2", "--output_dir", out, "--debug"]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", DRIVER] + argv, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for rank, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"rank {rank} failed:\nSTDOUT:\n{stdout[-3000:]}\n"
            f"STDERR:\n{stderr[-3000:]}")
        outs.append(stdout)

    # launcher discovery: env-var path, both ranks joined one runtime
    assert "initialized jax.distributed via env: process 0/2" in outs[0]
    # sharded loading: 16 items / 2 processes / batch 2 = 4 batches each
    assert "PROBE process=0/2 train_batches=4" in outs[0]
    assert "PROBE process=1/2 train_batches=4" in outs[1]
    # rank-0-only stdout (reference: util/misc.py:174-188)
    assert "effective batch size: 4" in outs[0]  # 2 bs × 1 accum × 2 procs
    assert "effective batch size" not in outs[1]

    # single merged JSON-lines log, written once by process 0
    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert len(lines) == 1
    assert np.isfinite(lines[0]["train_loss"])
    assert "val_acc" in lines[0]

    # one checkpoint tree (Orbax multihost writer election, no clobber)
    assert os.path.isdir(os.path.join(out, "checkpoint_last"))
    meta = json.load(open(os.path.join(out, "checkpoint_last.meta.json")))
    assert meta["epoch"] == 0


@pytest.fixture(scope="module")
def synth_root9(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_data9")
    subprocess.run(
        [sys.executable, "scripts/make_synthetic_data.py", "--root",
         str(root), "--n", "9"], check=True, capture_output=True, cwd=REPO)
    return str(root)


def test_two_process_grain_odd_dataset(synth_root9, tmp_path):
    """Grain backend, 9 examples across 2 processes: the shorter shard must
    pad by wrap-around so both ranks run the SAME number of batches — with
    unequal counts the full (non-debug) epoch would hang in the metric
    sync collective."""
    out = str(tmp_path / "out_mp_grain")
    port = _free_port()
    argv = ["--model", "tiny", "--dataset", "nextqa", "--data_root",
            synth_root9, "--batch_size", "2", "--max_seq_len", "128",
            "--epochs", "1", "--warmup_epochs", "0.5", "--blr", "9e-1",
            "--loader", "grain", "--dp", "2", "--output_dir", out]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", DRIVER] + argv, cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for rank, p in enumerate(procs):
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, (
            f"rank {rank} failed:\nSTDOUT:\n{stdout[-3000:]}\n"
            f"STDERR:\n{stderr[-3000:]}")
        outs.append(stdout)

    lines = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert len(lines) == 1
    assert np.isfinite(lines[0]["train_loss"])
