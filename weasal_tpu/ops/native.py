"""ctypes bindings + on-demand build for the native host geometry kernels.

The reference ships distutils-built CPython extensions
(cpp_wrappers/compile_wrappers.sh); here the native library is a plain
C-ABI shared object built once with g++ on first use and loaded via ctypes
(no Python.h dependency). Falls back cleanly when no compiler exists —
callers (ops.subsample / ops.neighbors host paths) keep their numpy/scipy
implementations as reference behavior.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from os.path import dirname, exists, getmtime, join

import numpy as np

_SRC = join(dirname(dirname(os.path.abspath(__file__))),
            "cpp", "geometry.cpp")
_LIB_DIR = join(dirname(_SRC), "build")
_LIB = join(_LIB_DIR, "libwslgeometry.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native geometry build failed ({e}); using numpy fallback")
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("WEASAL_NO_NATIVE"):
            _build_failed = True
            return None
        needs_build = (not exists(_LIB)
                       or getmtime(_LIB) < getmtime(_SRC))
        if needs_build and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.wsl_grid_subsample.restype = ctypes.c_int
        lib.wsl_grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        lib.wsl_radius_search.restype = None
        lib.wsl_radius_search.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsample_native(points: np.ndarray,
                          features: np.ndarray | None = None,
                          labels: np.ndarray | None = None,
                          dl: float = 0.1,
                          max_out: int = 0):
    """Native voxel subsample; same output contract as ops.subsample
    (canonical voxel order, barycenters, feature means, majority labels)."""
    lib = get_lib()
    assert lib is not None
    points = np.ascontiguousarray(points, dtype=np.float32)
    n = points.shape[0]
    fdim = 0
    f_in = f_out = None
    if features is not None:
        features = np.ascontiguousarray(features, dtype=np.float32)
        if features.ndim == 1:
            features = features[:, None]
        fdim = features.shape[1]
    l_in = None
    if labels is not None:
        l_in = np.ascontiguousarray(np.squeeze(labels), dtype=np.int32)

    cap = max_out if max_out > 0 else n
    out_points = np.empty((cap, 3), np.float32)
    out_features = np.empty((cap, fdim), np.float32) if fdim else None
    out_labels = np.empty((cap,), np.int32) if labels is not None else None

    count = lib.wsl_grid_subsample(
        _fptr(points), n,
        _fptr(features) if fdim else None, fdim,
        _iptr(l_in) if l_in is not None else None,
        ctypes.c_float(dl),
        _fptr(out_points),
        _fptr(out_features) if fdim else None,
        _iptr(out_labels) if out_labels is not None else None,
        cap)

    out = [out_points[:count]]
    if fdim:
        out.append(out_features[:count])
    if out_labels is not None:
        out.append(out_labels[:count])
    return out[0] if len(out) == 1 else tuple(out)


def radius_search_native(queries: np.ndarray, supports: np.ndarray,
                         radius: float, max_count: int) -> np.ndarray:
    """Native bucket-grid radius search; distance-sorted rows, shadow = ns."""
    lib = get_lib()
    assert lib is not None
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    supports = np.ascontiguousarray(supports, dtype=np.float32)
    out = np.empty((queries.shape[0], max_count), np.int32)
    lib.wsl_radius_search(
        _fptr(queries), queries.shape[0],
        _fptr(supports), supports.shape[0],
        ctypes.c_float(radius), max_count, _iptr(out))
    return out
