"""ctypes loader for the native host-side runtime (native/graphops.cpp).

Builds the shared library on first use with the system toolchain and caches
it next to the source; falls back to the pure-Python implementations if no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional

import numpy as np

_ROOT = osp.abspath(osp.join(osp.dirname(__file__), "..", ".."))
_SRC = osp.join(_ROOT, "native", "graphops.cpp")
_LIB = osp.join(_ROOT, "native", "libgraphops.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.isfile(_SRC):
        return None
    if not osp.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None

    lp = ctypes.POINTER(ctypes.c_long)
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.select_proximity_edges.restype = ctypes.c_int
    lib.select_proximity_edges.argtypes = [
        dp, lp, lp, ctypes.c_int, ctypes.c_int,
        lp, lp, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int,
        lp, lp, ctypes.c_int,
    ]
    lib.dedup_edges.restype = ctypes.c_int
    lib.dedup_edges.argtypes = [
        lp, lp, ctypes.c_int, lp, lp, ctypes.c_int, ip,
    ]
    _lib = lib
    return _lib


def _lptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_long))


def select_proximity_edges(
    d: np.ndarray, ii: np.ndarray, jj: np.ndarray, cc: int,
    exist_ii: np.ndarray, exist_jj: np.ndarray,
    t0: int, t1: int, t: int, rad: int, nms: int, thresh: float,
    max_factors: int,
):
    """Native edge selection; returns (ii_out, jj_out) or None if the
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(d, dtype=np.float64)
    ii = np.ascontiguousarray(ii, dtype=np.int64)
    jj = np.ascontiguousarray(jj, dtype=np.int64)
    exist_ii = np.ascontiguousarray(exist_ii, dtype=np.int64)
    exist_jj = np.ascontiguousarray(exist_jj, dtype=np.int64)
    max_out = 4 * (max_factors + 4 * (t - t0) * (rad + 2) + 8)
    out_ii = np.empty(max_out, dtype=np.int64)
    out_jj = np.empty(max_out, dtype=np.int64)
    n = lib.select_proximity_edges(
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _lptr(ii), _lptr(jj), len(ii), cc,
        _lptr(exist_ii), _lptr(exist_jj), len(exist_ii),
        t0, t1, t, rad, nms, float(thresh), max_factors,
        _lptr(out_ii), _lptr(out_jj), max_out,
    )
    return out_ii[:n], out_jj[:n]
