"""Training checkpoints: adapter-only save/resume via Orbax.

Reproduces the reference's checkpoint policy (reference: util/misc.py:297-336,
train.py:139-142): only the ~4.6M trainable params + optimizer state + epoch
are written (best-val-acc gated by the trainer); the frozen 7B backbone is
never saved — resuming needs the converted base checkpoint. Process-0-only
writing is handled by Orbax's multihost logic.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree):
    """Host-fetch a (possibly multi-process) param tree to numpy.

    Under a multi-process mesh, jit may leave updated trainables/opt-state
    sharded across processes (e.g. GSPMD shards them over tp when tp spans
    process boundaries) — np.asarray alone raises on those. The allgather is
    collective, which is safe here: save()/restore() are already called on
    every process (Orbax multihost contract, see save())."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


class CheckpointManager:
    """Adapter-only train-state checkpoints (best + optional per-epoch)."""

    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, trainable, opt_state, epoch: int,
             best_acc: float = 0.0, extra: Optional[Dict[str, Any]] = None):
        state = {
            "trainable": _to_numpy_tree(trainable),
            "opt_state": _to_numpy_tree(opt_state),
        }
        path = self.path(name)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        meta = {"epoch": int(epoch), "best_acc": float(best_acc),
                **(extra or {})}
        # sidecar next to (not inside) the orbax dir — orbax owns its layout.
        # The orbax save above is collective (every process must call it),
        # but the sidecar write must be single-writer: on shared storage N
        # concurrent writers can interleave into invalid JSON. Atomic
        # replace guards concurrent readers on POSIX filesystems too.
        if jax.process_index() == 0:
            tmp = path + ".meta.json.tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, path + ".meta.json")

    def restore(self, name: str, trainable_template, opt_state_template):
        """Restore (trainable, opt_state, meta). Templates supply structure +
        dtypes (reference resumes with strict=False + optimizer + epoch,
        misc.py:323-336)."""
        path = self.path(name)
        target = {
            "trainable": _to_numpy_tree(trainable_template),
            "opt_state": _to_numpy_tree(opt_state_template),
        }
        state = self._ckpt.restore(path, target)
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        return state["trainable"], state["opt_state"], meta

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))
