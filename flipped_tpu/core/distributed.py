"""Multi-process runtime bring-up with launcher auto-discovery.

TPU-native replacement of the reference's `init_distributed_mode`
(reference: util/misc.py:220-250): where the reference discovers RANK /
WORLD_SIZE from torchrun, SLURM, or OpenMPI env vars and opens an NCCL
process group, we discover the launcher and initialize JAX's distributed
runtime — after which `jax.process_index()/process_count()` replace
RANK/WORLD_SIZE and the GSPMD mesh collectives (over ICI within a slice,
DCN across slices) replace every NCCL call.

Discovery order (first match wins):
  1. explicit env: JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES,
     JAX_PROCESS_ID) — the manual / test-harness path, analogous to the
     reference's RANK/WORLD_SIZE branch (util/misc.py:222-225);
  2. SLURM step with >1 task (util/misc.py:230-233) — topology is filled in
     by JAX's built-in SlurmCluster plugin;
  3. OpenMPI with >1 rank (util/misc.py:234-237) — OmpiCluster plugin;
  4. Cloud TPU VM (pod slices / multislice) — `jax.distributed.initialize()`
     reads the TPU metadata itself (GCE/GKE cluster plugins);
  5. none → single-process mode (util/misc.py:226-229).
"""
from __future__ import annotations

import os

_initialized = False


def detect_launcher() -> tuple:
    """Returns (launcher_name, initialize_kwargs) or (None, {})."""
    e = os.environ
    if e.get("JAX_COORDINATOR_ADDRESS"):
        kw = {}
        if "JAX_NUM_PROCESSES" in e:
            kw["num_processes"] = int(e["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in e:
            kw["process_id"] = int(e["JAX_PROCESS_ID"])
        return "env", kw
    slurm_keys = ("SLURM_JOB_ID", "SLURM_STEP_NODELIST", "SLURM_NTASKS",
                  "SLURM_PROCID", "SLURM_LOCALID")
    if all(k in e for k in slurm_keys) and int(e["SLURM_NTASKS"]) > 1:
        return "slurm", {}
    if int(e.get("OMPI_COMM_WORLD_SIZE", "1") or "1") > 1:
        return "ompi", {}
    try:
        from jax._src.cloud_tpu_init import running_in_cloud_tpu_vm
    except Exception:
        running_in_cloud_tpu_vm = False
    if running_in_cloud_tpu_vm:
        return "tpu", {}
    return None, {}


def init_distributed_mode() -> bool:
    """Initialize jax.distributed if a multi-process launcher is detected.

    Returns True when running multi-process after the call. Safe to call
    unconditionally and more than once; single-process runs (no launcher
    detected) are a no-op, matching the reference's fallback
    (util/misc.py:226-229).
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    launcher, kw = detect_launcher()
    if launcher is None:
        return False
    try:
        jax.distributed.initialize(**kw)
    except Exception as exc:  # noqa: BLE001 — degrade, don't die
        if launcher == "tpu":
            # single-host TPU VM without pod metadata: run as one process
            print("jax.distributed.initialize() skipped "
                  f"(single-host TPU?): {exc}")
            return False
        raise
    _initialized = True
    print(f"initialized jax.distributed via {launcher}: "
          f"process {jax.process_index()}/{jax.process_count()}")
    return jax.process_count() > 1
