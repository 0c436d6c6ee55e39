"""ctypes bindings for the native C++ helpers (csrc/native.cpp).

Builds the shared library on first use if a compiler is available; all
callers fall back to pure-numpy implementations when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "libmfem_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.grid_pairs.restype = ctypes.c_longlong
        lib.grid_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.c_longlong,
        ]
        lib.parse_mesh.restype = ctypes.c_longlong
        lib.parse_mesh.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.ichol0.restype = ctypes.c_double
        lib.ichol0.argtypes = [
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.ichol_solve.restype = None
        lib.ichol_solve.argtypes = [
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _lptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def grid_pairs(P: np.ndarray, Q: np.ndarray, cell: float):
    """Native grid-hash pair generation; returns (i, j) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    P = np.ascontiguousarray(P, np.float64)
    Q = np.ascontiguousarray(Q, np.float64)
    cap = max(4 * (len(P) + len(Q)), 1 << 16)
    for _ in range(4):
        out_i = np.empty(cap, np.int64)
        out_j = np.empty(cap, np.int64)
        n = lib.grid_pairs(
            _dptr(P), len(P), _dptr(Q), len(Q), P.shape[1], float(cell),
            _lptr(out_i), _lptr(out_j), cap,
        )
        if n >= 0:
            return out_i[:n], out_j[:n]
        cap = int(-n) + 16
    return None


def ichol0(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray):
    """Native IC(0) of a lower-triangular CSR (data overwritten with L).

    Returns the diagonal shift applied (>= 0.0), or None on fallback /
    factorization failure."""
    lib = _load()
    if lib is None:
        return None
    n = len(indptr) - 1
    sigma = lib.ichol0(n, _lptr(indptr), _lptr(indices), _dptr(data))
    return None if sigma < 0.0 else float(sigma)


def ichol_solve(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                x: np.ndarray) -> bool:
    """Native (L L^T)^{-1} apply, in place on x. False on fallback."""
    lib = _load()
    if lib is None:
        return False
    lib.ichol_solve(len(indptr) - 1, _lptr(indptr), _lptr(indices),
                    _dptr(data), _dptr(x))
    return True


def parse_mesh(path: str):
    """Native .mesh parse -> (V, T) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_longlong(0)
    nt = ctypes.c_longlong(0)
    rc = lib.parse_mesh(
        path.encode(), None, None, ctypes.byref(nv), ctypes.byref(nt)
    )
    if rc != 0:
        return None
    V = np.empty((nv.value, 3), np.float64)
    T = np.empty((nt.value, 4), np.int64)
    rc = lib.parse_mesh(
        path.encode(), _dptr(V), _lptr(T), ctypes.byref(nv), ctypes.byref(nt)
    )
    if rc != 0:
        return None
    return V, T.astype(np.int32)
