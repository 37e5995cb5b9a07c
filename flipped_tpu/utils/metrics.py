"""Metrics: windowed meters, cross-process sync, per-question-type accuracy.

Re-implements the reference's observability layer (reference:
util/misc.py:27-172 SmoothedValue/MetricLogger, misc.py:361-532 qtype
buckets): same windowed median/avg semantics and weighted global averages,
with NCCL all_reduce replaced by host-side aggregation +
`jax.experimental.multihost_utils` when running multi-process.
"""
from __future__ import annotations

import datetime
import json
import time
from collections import defaultdict, deque
from typing import Dict, Iterable

import numpy as np


def allgather_payload(obj):
    """Allgather a small JSON-serializable object across JAX processes.

    Collectives require identical buffer shapes on every process, so this
    runs two rounds: allgather the byte lengths, then allgather buffers
    padded to the global max. Returns the list of every process's object
    (single-process: [obj])."""
    import jax

    if jax.process_count() <= 1:
        return [obj]
    from jax.experimental import multihost_utils

    data = np.frombuffer(json.dumps(obj).encode(), np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray([data.size], np.int32))          # (nproc, 1)
    buf = np.zeros(int(lens.max()), np.uint8)
    buf[:data.size] = data
    bufs = multihost_utils.process_allgather(buf)   # (nproc, max_len)
    return [json.loads(bytes(b[:int(n)]).decode())
            for b, n in zip(bufs, lens[:, 0])]


def device_memory_gib():
    """(live_GiB, peak_GiB) of the first local device's HBM, or None when the
    backend doesn't report (CPU). TPU-native equivalent of the reference's
    torch.cuda.max_memory_allocated print (util/misc.py:162-170) — HBM
    pressure drives the batch/remat/quantization decisions in docs/PERF.md."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    gib = 1024 ** 3
    return (stats.get("bytes_in_use", 0) / gib,
            stats.get("peak_bytes_in_use", 0) / gib)


class SmoothedValue:
    """Windowed median/avg + weighted global average
    (reference: util/misc.py:27-103)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0.0
        self.fmt = fmt

    def update(self, value: float, n: float = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        """Sum (count, total) across JAX processes (the reference's
        dist.all_reduce, misc.py:58-70). NOTE: only safe standalone when
        every process calls it the same number of times — MetricLogger syncs
        whole meter DICTS instead, since per-qtype meters can differ across
        processes' data shards."""
        import jax

        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils

        arr = np.asarray([self.count, self.total], np.float64)
        summed = multihost_utils.process_allgather(arr).sum(axis=0)
        self.count, self.total = float(summed[0]), float(summed[1])

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1e-12)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """(reference: util/misc.py:106-172)"""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, n: float = 1, **kwargs):
        for k, v in kwargs.items():
            if v is None:
                continue
            self.meters[k].update(float(v), n=n)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        """Merge (count, total) of every meter across processes. Unlike a
        per-meter all_reduce, this tolerates DIFFERENT meter sets per process
        (e.g. qtype buckets that only some data shards contain): meter names
        and values travel in one variable-length payload gather, and the
        union is installed on every process."""
        import jax

        if jax.process_count() <= 1:
            return
        payload = {k: [m.count, m.total] for k, m in self.meters.items()}
        merged: Dict[str, list] = {}
        for d in allgather_payload(payload):
            for k, (c, t) in d.items():
                mc, mt = merged.get(k, (0.0, 0.0))
                merged[k] = [mc + c, mt + t]
        for k, (c, t) in merged.items():
            meter = self.meters[k]  # defaultdict creates absent buckets
            meter.count, meter.total = c, t

    def averages(self) -> Dict[str, float]:
        return {k: m.global_avg for k, m in self.meters.items()}

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterable:
        """Iterate with iter/data-time meters and periodic prints
        (reference: util/misc.py:124-172, minus the CUDA memory counter)."""
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and (i % max(print_freq, 1) == 0
                               or (total and i == total - 1)):
                eta = ""
                if total:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                mem = device_memory_gib()
                mem_s = f"  hbm: {mem[0]:.2f}/{mem[1]:.2f}GiB" if mem else ""
                print(f"{header} [{i}{f'/{total}' if total else ''}]  {eta}"
                      f"{self}  time: {iter_time}  data: {data_time}{mem_s}",
                      flush=True)
            i += 1
            end = time.time()
        if total is not None:
            elapsed = time.time() - start
            print(f"{header} Total time: "
                  f"{datetime.timedelta(seconds=int(elapsed))} "
                  f"({elapsed / max(total, 1):.4f} s / it)", flush=True)


# --- per-question-type accuracy buckets ---------------------------------------

def qtype_frequencies(qtypes: np.ndarray, correct: np.ndarray,
                      qtype_ids) -> Dict[int, list]:
    """bucket 0 = overall (reference: util/misc.py:416-426)."""
    freq = {i: [0.0, 0.0] for i in qtype_ids}
    freq[0] = [0.0, 0.0]
    for qt, c in zip(np.asarray(qtypes).tolist(),
                     np.asarray(correct, np.float64).tolist()):
        if qt in freq:
            freq[qt][0] += c
            freq[qt][1] += 1
        freq[0][0] += c
        freq[0][1] += 1
    return freq


def _grouped(freq, ids):
    num = sum(freq[i][0] for i in ids)
    den = sum(freq[i][1] for i in ids)
    return num / den if den else 0.0, den


# Per-dataset qtype grouping (reference: util/misc.py:428-532)
_GROUPS = {
    "nextqa": {"C": [1, 2], "T": [3, 4, 5], "D": [6, 7, 8], "Total": [0]},
    "star": {"In": [1], "Seq": [2], "Pre": [3], "Feas": [4], "Total": [0]},
    "valor32k": {
        "audio": [2, 5, 8, 11, 14, 17], "visual": [1, 4, 7, 10, 13, 16, 20],
        "both": [3, 6, 9, 12, 15, 18, 19], "count": [1, 2, 3],
        "temporal": [4, 5, 6], "desc": [7, 8, 9], "action": [10, 11, 12],
        "loc": [13, 14, 15], "rel_pos": [16, 17, 18],
        "audio_second": [19, 20], "Total": [0],
    },
    "musicavqa": {
        "audio": [1, 2, 3, 4, 5], "visual": [6, 7, 8, 9, 10],
        "audio_visual": [11, 12, 13, 14, 15], "temporal": [1, 6, 11],
        "existential": [2, 7, 12], "comparative": [3, 8, 13],
        "location": [4, 9, 14], "counting": [5, 10, 15], "Total": [0],
    },
}


def log_qtype(dataset_name: str, qtypes: np.ndarray, correct: np.ndarray,
              logger: MetricLogger, qtype_ids=None):
    """Update grouped accuracy meters (reference: util/misc.py:522-532).
    Meters are count-weighted so epoch-level global_avg is exact."""
    groups = _GROUPS.get(dataset_name)
    if not groups:
        return
    if qtype_ids is None:
        qtype_ids = sorted({i for ids in groups.values() for i in ids} - {0})
    freq = qtype_frequencies(qtypes, correct, qtype_ids)
    for name, ids in groups.items():
        acc, n = _grouped(freq, ids)
        if n:
            logger.update(n=n, **{name: acc})
