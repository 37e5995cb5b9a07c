"""Process-0 logging + JSON-lines training log + per-rank result merge.

Reference equivalents: rank-0-only print monkeypatch (util/misc.py:174-188),
per-epoch JSON-lines log.txt (train.py:144-148), per-rank JSON result
sharding + rank-0 merge for extracted answers (util/misc.py:570-610).
"""
from __future__ import annotations

import builtins
import datetime
import json
import os
from typing import Any, Dict, List


def is_main_process() -> bool:
    import jax
    return jax.process_index() == 0


def setup_for_distributed(force: bool = False):
    """Silence prints on non-zero processes, prefix timestamps
    (reference: util/misc.py:174-188). Idempotent."""
    if getattr(builtins.print, "_flipped_wrapped", False):
        return
    builtin_print = builtins.print
    main = is_main_process()

    def print_fn(*args, **kwargs):
        # pop unconditionally — short-circuiting would leak the kwarg into
        # builtin print on the main process (reference pops first too,
        # util/misc.py:179)
        forced = kwargs.pop("force", False)
        if main or force or forced:
            now = datetime.datetime.now().time()
            builtin_print(f"[{now}]", *args, **kwargs)

    print_fn._flipped_wrapped = True
    builtins.print = print_fn


def write_log_line(output_dir: str, stats: Dict[str, Any]):
    """Append one JSON line to {output_dir}/log.txt (reference:
    train.py:144-148); consumed by the plotting tool."""
    if not output_dir or not is_main_process():
        return
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "log.txt"), "a", encoding="utf-8") as f:
        f.write(json.dumps(stats) + "\n")


def save_result(result: List[Any], result_dir: str, filename: str) -> str:
    """Write per-process result shards and merge on process 0
    (reference: util/misc.py:570-610). Returns the merged path (process 0)."""
    import jax

    os.makedirs(result_dir, exist_ok=True)
    rank = jax.process_index()
    shard = os.path.join(result_dir, f"{filename}_rank{rank}.json")
    with open(shard, "w") as f:
        json.dump(result, f)

    final = os.path.join(result_dir, f"{filename}.json")
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"save_result:{filename}")
    if is_main_process():
        merged: List[Any] = []
        for r in range(jax.process_count()):
            p = os.path.join(result_dir, f"{filename}_rank{r}.json")
            if os.path.exists(p):
                with open(p) as f:
                    merged += json.load(f)
        with open(final, "w") as f:
            json.dump(merged, f)
        print(f"result file saved to {final}")
    return final
