"""ctypes bindings for the C++ host runtime (grid subsampling, kNN).

The reference ships its host-side point processing as C++
(``openpoints/cpp/subsampling``, nanoflann kNN in the SemanticKITTI
utils); these are the TPU-framework equivalents, living in the input
pipeline. The shared library builds with ``make`` in
``runtime/native/`` (auto-built on first use when g++ is available);
pure-numpy fallbacks keep everything working without the toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmtx_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.grid_subsample.restype = ctypes.c_int
    lib.grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.knn_search.restype = ctypes.c_int
    lib.knn_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample(
    points: np.ndarray, features: Optional[np.ndarray] = None, dl: float = 0.1
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Voxel-grid average subsampling. points [N,3] -> [M,3] (M<=N)."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    fdim = 0 if features is None else features.shape[1]
    feats = (
        np.ascontiguousarray(features, np.float32)
        if features is not None
        else np.zeros((n, 0), np.float32)
    )
    lib = _load()
    if lib is not None:
        out_p = np.empty_like(points)
        out_f = np.empty((n, fdim), np.float32)
        out_n = ctypes.c_int64(0)
        rc = lib.grid_subsample(
            _fptr(points), n, _fptr(feats), fdim, ctypes.c_float(dl),
            _fptr(out_p), _fptr(out_f), ctypes.byref(out_n),
        )
        if rc == 0:
            m = out_n.value
            return out_p[:m].copy(), (out_f[:m].copy() if fdim else None)
    # numpy fallback (same voxel-average semantics, first-seen order)
    keys = np.floor(points / dl).astype(np.int64)
    _, first_idx, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    inv = rank[inv]
    m = len(first_idx)
    counts = np.bincount(inv, minlength=m).astype(np.float32)
    out_p = np.zeros((m, 3), np.float32)
    for d in range(3):
        out_p[:, d] = np.bincount(inv, weights=points[:, d], minlength=m)
    out_p /= counts[:, None]
    out_f = None
    if fdim:
        out_f = np.zeros((m, fdim), np.float32)
        for d in range(fdim):
            out_f[:, d] = np.bincount(inv, weights=feats[:, d], minlength=m)
        out_f /= counts[:, None]
    return out_p, out_f


def knn_search(
    support: np.ndarray, queries: np.ndarray, k: int
) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest support points per query -> (idx [M,k] int64, d2 [M,k])."""
    support = np.ascontiguousarray(support, np.float32)
    queries = np.ascontiguousarray(queries, np.float32)
    n, m = len(support), len(queries)
    lib = _load()
    if lib is not None:
        out_i = np.empty((m, k), np.int64)
        out_d = np.empty((m, k), np.float32)
        rc = lib.knn_search(
            _fptr(support), n, _fptr(queries), m, k,
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), _fptr(out_d),
        )
        if rc == 0:
            return out_i, out_d
    d2 = (
        np.sum(queries**2, 1)[:, None]
        + np.sum(support**2, 1)[None]
        - 2.0 * queries @ support.T
    )
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    return idx.astype(np.int64), np.take_along_axis(d2, idx, 1).astype(np.float32)
