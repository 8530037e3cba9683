"""ctypes binding for the native (C++) data-layer kernels.

Builds native/dldkd_native.cpp with g++ on first use (cached next to the
source) and exposes the corpus packer + row gather. Everything here has a
pure-numpy fallback in dldkd_tpu.data.ingest; `load()` returning None means
"use the fallback" (no toolchain, or DLDKD_NO_NATIVE=1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dldkd_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libdldkd_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DLDKD_NO_NATIVE"):
            return None
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.bigfile_gather.restype = ctypes.c_int
        lib.bigfile_gather.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, _i64p, ctypes.c_int64, _f32p]
        lib.pack_corpus.restype = ctypes.c_int
        lib.pack_corpus.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64,
            _i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_float,
            _f32p, _f32p, ctypes.c_int]
        lib.resample_mean_pool.restype = None
        lib.resample_mean_pool.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _f32p]
        lib.l2norm_rows.restype = None
        lib.l2norm_rows.argtypes = [
            _f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
        _lib = lib
        return _lib


def pack_corpus_native(
    bin_path: str,
    dim: int,
    frame_indices: List[np.ndarray],   # per video: BigFile row indices
    align_len: Optional[np.ndarray],   # per video teacher length, or None
    max_ctx_l: int,
    l2norm: bool = True,
    eps: float = 1e-5,
    n_threads: int = 0,
) -> Optional[tuple]:
    """(feats (N, L, D), mask (N, L)) packed by the C++ thread pool, or None
    if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    n = len(frame_indices)
    rows = np.concatenate(frame_indices).astype(np.int64) if n else \
        np.zeros(0, np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(f) for f in frame_indices], out=offsets[1:])
    if align_len is None:
        align_len = np.zeros(n, np.int64)
    align_len = np.ascontiguousarray(align_len, np.int64)
    feats = np.zeros((n, max_ctx_l, dim), np.float32)
    mask = np.zeros((n, max_ctx_l), np.float32)
    rc = lib.pack_corpus(bin_path.encode(), dim,
                         np.ascontiguousarray(rows),
                         np.ascontiguousarray(offsets), n, align_len,
                         max_ctx_l, int(l2norm), eps, feats, mask, n_threads)
    if rc != 0:
        raise IOError(f"native pack_corpus failed reading {bin_path}")
    return feats, mask


def resample_mean_pool(features: np.ndarray, max_len: int) -> np.ndarray:
    """Native uniform_feature_sampling; falls back to the numpy version."""
    lib = load()
    n_in, dim = features.shape
    if lib is None or n_in <= max_len:
        from dldkd_tpu.data.ingest import uniform_feature_sampling
        return uniform_feature_sampling(features, max_len)
    src = np.ascontiguousarray(features, np.float32)
    out = np.empty((max_len, dim), np.float32)
    lib.resample_mean_pool(src, n_in, dim, max_len, out)
    return out
