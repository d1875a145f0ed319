"""ctypes bindings for the native host-side library (native/chamfer_cpu.cpp).

The C++ library is the CPU-native counterpart of the device kernels — the
equivalent tier of the reference's external native ops (CUDA Chamfer,
psbody C++), used by host-side data tooling. Built on demand with
native/build.sh; all entry points fall back to numpy if the shared object
is missing or the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libchamfer_cpu.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["sh", os.path.join(_LIB_DIR, "build.sh")],
                           check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib = False
        return _lib
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.nn_distance_f32.argtypes = [f32p, ctypes.c_int64, f32p,
                                    ctypes.c_int64, u8p, f32p, i32p]
    lib.chamfer_f32.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                f32p, i32p, f32p, i32p]
    lib.nn_distance_grid_f32.argtypes = [f32p, ctypes.c_int64, f32p,
                                         ctypes.c_int64, ctypes.c_float,
                                         f32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _as_f32(x):
    return np.ascontiguousarray(x, np.float32)


def nn_distance_cpu(query: np.ndarray, points: np.ndarray,
                    mask: np.ndarray | None = None,
                    use_grid: bool = False):
    """(dist2 [N], idx [N]) — native if built, numpy fallback otherwise."""
    q, p = _as_f32(query), _as_f32(points)
    n, m = len(q), len(p)
    lib = _load()
    if lib:
        dist = np.empty(n, np.float32)
        idx = np.empty(n, np.int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        if use_grid and mask is None:
            lib.nn_distance_grid_f32(
                q.ctypes.data_as(f32p), n, p.ctypes.data_as(f32p), m,
                ctypes.c_float(0.0),
                dist.ctypes.data_as(f32p), idx.ctypes.data_as(i32p))
        else:
            mask_arr = (np.ascontiguousarray(mask, np.uint8)
                        if mask is not None else None)
            lib.nn_distance_f32(
                q.ctypes.data_as(f32p), n, p.ctypes.data_as(f32p), m,
                mask_arr.ctypes.data_as(u8p) if mask_arr is not None
                else ctypes.cast(None, u8p),
                dist.ctypes.data_as(f32p), idx.ctypes.data_as(i32p))
        return dist, idx
    # numpy fallback (blocked)
    dist = np.full(n, np.inf, np.float32)
    idx = np.zeros(n, np.int32)
    valid = (np.ones(m, bool) if mask is None
             else np.asarray(mask, bool))
    pv = p[valid]
    remap = np.flatnonzero(valid)
    B = 512
    for s in range(0, n, B):
        d = ((q[s:s + B, None] - pv[None]) ** 2).sum(-1)
        loc = d.argmin(1)
        dist[s:s + B] = d[np.arange(len(loc)), loc]
        idx[s:s + B] = remap[loc]
    return dist, idx


def chamfer_cpu(a: np.ndarray, b: np.ndarray):
    """Bidirectional Chamfer on host."""
    da, ia = nn_distance_cpu(a, b)
    db, ib = nn_distance_cpu(b, a)
    return da, db, ia, ib
