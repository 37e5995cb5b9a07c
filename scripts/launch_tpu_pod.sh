#!/usr/bin/env bash
# Multi-host TPU pod launch — the TPU-native replacement of the reference's
# torchrun/SLURM launch (reference: run.sh, submit_job.sh).
#
# On Cloud TPU pod slices, run this same command on every host (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...` or XPK);
# jax.distributed.initialize() picks up the topology from the TPU runtime
# automatically. For manual/CPU multi-process testing, set the env vars
# below per process — the trainer calls jax.distributed.initialize() when
# JAX_COORDINATOR_ADDRESS is present (flipped_tpu/cli/train.py).
#
#   JAX_COORDINATOR_ADDRESS=host0:1234   # coordinator (process 0) address
#   JAX_NUM_PROCESSES=4                  # total processes
#   JAX_PROCESS_ID=$i                    # this process's index
#
# Each process loads its own shard of every batch (Loader shards by
# jax.process_index(), data/pipeline.py) and GSPMD reduces gradients over
# ICI/DCN from the mesh shardings — there is no NCCL/DDP equivalent to set up.
set -e
DATASET=${1:-nextqa}
shift || true
exec bash "$(dirname "$0")/recipes.sh" "$DATASET" "$@"
