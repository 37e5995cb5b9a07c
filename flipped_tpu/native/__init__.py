"""ctypes bindings for the native host-side batch-assembly kernels, with
pure-numpy fallbacks. The .so is built lazily on first import (cached under
the package dir); any failure falls back silently — the numpy paths are the
behavioral reference."""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfeature_pack.so"
_LIB = None


def _build() -> bool:
    src = _DIR / "feature_pack.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.pack_features_batch.argtypes = [
        f32p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, i64p]
    lib.pack_lm_labels.argtypes = [
        i32p, i64p, ctypes.c_int64, ctypes.c_int64, i32p, f32p, i32p]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_features_batch(feature_list, max_feats: int,
                        dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """List of (len_i, dim) float arrays → ((n, max_feats, dim), (n,) lens),
    reference downsample semantics (nextqa.py:71-82)."""
    lib = _load()
    n = len(feature_list)
    if lib is None:
        from ..data.feature_store import uniform_downsample
        out = np.zeros((n, max_feats, dim), np.float32)
        lens = np.zeros(n, np.int64)
        for i, f in enumerate(feature_list):
            out[i], lens[i] = uniform_downsample(f, max_feats, dim)
        return out, lens

    lengths = np.array([len(f) for f in feature_list], np.int64)
    offsets = np.zeros(n, np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    flat = (np.concatenate(feature_list, axis=0).astype(np.float32)
            if n else np.zeros((0, dim), np.float32))
    flat = np.ascontiguousarray(flat)
    out = np.zeros((n, max_feats, dim), np.float32)
    out_len = np.zeros(n, np.int64)
    lib.pack_features_batch(
        _ptr(flat, ctypes.c_float), _ptr(offsets, ctypes.c_int64),
        _ptr(lengths, ctypes.c_int64), n, max_feats, dim,
        _ptr(out, ctypes.c_float), _ptr(out_len, ctypes.c_int64))
    return out, out_len


def pack_lm_labels(text_id: np.ndarray,
                   prefix: np.ndarray) -> Tuple[np.ndarray, np.ndarray,
                                                np.ndarray]:
    """(n, s) padded ids (+ per-row prefix) → (labels, mask, clean ids),
    reference masking semantics (base_dataset.py:63-77)."""
    lib = _load()
    text_id = np.ascontiguousarray(text_id, np.int32)
    n, s = text_id.shape
    prefix = np.ascontiguousarray(prefix, np.int64)
    if lib is None:
        labels = text_id.copy()
        cols = np.arange(s)[None]
        sup = (cols >= prefix[:, None]) & (text_id >= 0)
        labels = np.where(sup, text_id, 0).astype(np.int32)
        return labels, sup.astype(np.float32), np.where(
            text_id >= 0, text_id, 0).astype(np.int32)
    labels = np.zeros((n, s), np.int32)
    mask = np.zeros((n, s), np.float32)
    clean = np.zeros((n, s), np.int32)
    lib.pack_lm_labels(
        _ptr(text_id, ctypes.c_int32), _ptr(prefix, ctypes.c_int64), n, s,
        _ptr(labels, ctypes.c_int32), _ptr(mask, ctypes.c_float),
        _ptr(clean, ctypes.c_int32))
    return labels, mask, clean
