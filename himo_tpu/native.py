"""ctypes bindings for the himo_native C++ runtime library.

Builds lazily (``make`` in native/) and degrades gracefully: every consumer
checks :func:`available` and falls back to scipy/numpy. The library provides
the host-side hot loops — KD-tree NN queries, symmetric Chamfer, raw Scania
attribute readers, and the multi-threaded batch packer (SURVEY.md §3.5 hot
loops (b) and (d)).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libhimo_native.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception:
        _load_failed = True
        return None

    lib.himo_kd_build.restype = ctypes.c_void_p
    lib.himo_kd_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.himo_kd_free.argtypes = [ctypes.c_void_p]
    lib.himo_kd_query.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.himo_kd_query_k.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.himo_chamfer.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int32,
    ]
    lib.himo_read_attr.restype = ctypes.c_int64
    lib.himo_read_attr.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int32,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.himo_preload_files.restype = ctypes.c_int64
    lib.himo_preload_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.himo_pack_frames.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _try_load() is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _default_threads() -> int:
    return min(os.cpu_count() or 1, 16)


class KDTree:
    """Native 3-D KD-tree; drop-in for the NN part of scipy.cKDTree."""

    def __init__(self, points: np.ndarray):
        lib = _try_load()
        if lib is None:
            raise RuntimeError("himo_native library unavailable")
        self._lib = lib
        self._points = np.ascontiguousarray(points[:, :3], dtype=np.float32)
        self._handle = lib.himo_kd_build(_fptr(self._points), len(self._points))

    def query(
        self,
        queries: np.ndarray,
        k: int = 1,
        nthreads: Optional[int] = None,
    ):
        """(distances, indices) of the ``k`` nearest tree points per query
        row — scipy.cKDTree.query semantics: ``k=1`` returns (n,) arrays,
        ``k>1`` returns (n, k) sorted ascending (missing slots: inf / -1)."""
        q = np.ascontiguousarray(queries[:, :3], dtype=np.float32)
        n = len(q)
        if k == 1:
            d2 = np.empty(n, dtype=np.float32)
            idx = np.empty(n, dtype=np.int32)
            self._lib.himo_kd_query(
                self._handle,
                _fptr(q),
                n,
                _fptr(d2),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                nthreads or _default_threads(),
            )
            return np.sqrt(d2), idx
        d2 = np.empty((n, k), dtype=np.float32)
        idx = np.empty((n, k), dtype=np.int32)
        self._lib.himo_kd_query_k(
            self._handle,
            _fptr(q.reshape(-1)),
            n,
            k,
            _fptr(d2.reshape(-1)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            nthreads or _default_threads(),
        )
        d2[idx < 0] = np.inf  # unfilled slots (tree smaller than k)
        return np.sqrt(d2), idx

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.himo_kd_free(self._handle)
            self._handle = None


def chamfer(pc1: np.ndarray, pc2: np.ndarray, nthreads: Optional[int] = None) -> float:
    """Symmetric mean-NN Chamfer matching the eval definition."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("himo_native library unavailable")
    a = np.ascontiguousarray(pc1[:, :3], dtype=np.float32)
    b = np.ascontiguousarray(pc2[:, :3], dtype=np.float32)
    out = np.empty(2, dtype=np.float64)
    lib.himo_chamfer(
        _fptr(a),
        len(a),
        _fptr(b),
        len(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nthreads or _default_threads(),
    )
    return float((out[0] + out[1]) / 2.0)


def read_attr(path, dtype: str) -> np.ndarray:
    """Fast raw attribute-file reader (float32 / int32 / int8)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("himo_native library unavailable")
    code = {"float32": 0, "int32": 1, "int8": 2}[dtype]
    size = os.path.getsize(path)
    n = size // 4 if code in (0, 1) else size
    out = np.empty(n, dtype=np.float32 if code == 0 else np.int32)
    got = lib.himo_read_attr(
        str(path).encode(), code, out.ctypes.data_as(ctypes.c_void_p), n
    )
    if got < 0:
        raise IOError(f"failed to read {path}")
    return out[:got]


def preload_files(paths, queue_depth: int = 32) -> int:
    """Warm the page cache for upcoming scene files (io_uring reads, or a
    posix_fadvise(WILLNEED) pass where io_uring is unavailable). Returns
    bytes requested. Fire-and-forget from a prefetch thread: the fleet /
    trainer host loops call it for the NEXT scene while the device crunches
    the current batch."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("himo_native library unavailable")
    encoded = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * len(encoded))(*encoded)
    return int(lib.himo_preload_files(arr, len(encoded), queue_depth))


def pack_frames(
    frames, target: int, nthreads: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Pad+stack (n_i, C) float32 frames -> ((B, target, C), (B, target) bool)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("himo_native library unavailable")
    frames = [np.ascontiguousarray(f, dtype=np.float32) for f in frames]
    cols = frames[0].shape[1]
    b = len(frames)
    batch = np.empty((b, target, cols), dtype=np.float32)
    valid = np.empty((b, target), dtype=np.uint8)
    ptrs = (ctypes.POINTER(ctypes.c_float) * b)(*[_fptr(f) for f in frames])
    ns = np.array([len(f) for f in frames], dtype=np.int32)
    lib.himo_pack_frames(
        ptrs,
        ns.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b,
        cols,
        target,
        _fptr(batch.reshape(-1)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nthreads or _default_threads(),
    )
    return batch, valid.astype(bool)
