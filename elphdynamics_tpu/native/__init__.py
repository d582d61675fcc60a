"""Native (C++) host-side preprocessing, loaded via ctypes.

Compiled lazily with the system ``g++`` into a per-user cache; every entry
point silently falls back to the pure-Python implementation if the toolchain
or the compiled object is unavailable, so the package never hard-depends on
a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "checkerboard_native.cpp")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ELPHDYN_NO_NATIVE"):
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(),
                                 f"elphdyn_native_{os.getuid()}")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"ckb_{digest}.so")
        if not os.path.isfile(so_path):
            tmp = so_path + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, _SRC],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.ckb_groups.restype = ctypes.c_int64
        lib.ckb_groups.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int64] * 2 + [ctypes.c_void_p]
        lib.ckb_dense.restype = None
        lib.ckb_dense.argtypes = ([ctypes.c_void_p] * 2 + [ctypes.c_int64] * 2
                                  + [ctypes.c_void_p] * 2 + [ctypes.c_int, ctypes.c_void_p])
        lib.dedup_pairs.restype = None
        lib.dedup_pairs.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_int64, ctypes.c_void_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def checkerboard_groups(neighbor_table: np.ndarray):
    """Native greedy grouping; returns None if native code is unavailable."""
    lib = _load()
    if lib is None:
        return None
    nb = neighbor_table.shape[1]
    if nb == 0:
        return np.zeros(0, dtype=np.int64)
    ti = np.ascontiguousarray(neighbor_table[0], dtype=np.int64)
    tj = np.ascontiguousarray(neighbor_table[1], dtype=np.int64)
    nsites = int(neighbor_table.max()) + 1
    groups = np.empty(nb, dtype=np.int64)
    lib.ckb_groups(ti.ctypes.data, tj.ctypes.data, nb, nsites, groups.ctypes.data)
    return groups


def dense_matrix(neighbor_table: np.ndarray, nsites: int, cosh_b, sinh_b,
                 inverse: bool = False):
    """Native dense checkerboard assembly; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    nb = neighbor_table.shape[1]
    ti = np.ascontiguousarray(neighbor_table[0], dtype=np.int64)
    tj = np.ascontiguousarray(neighbor_table[1], dtype=np.int64)
    c = np.ascontiguousarray(cosh_b, dtype=np.float64)
    s = np.ascontiguousarray(sinh_b, dtype=np.float64)
    D = np.eye(nsites)
    lib.ckb_dense(ti.ctypes.data, tj.ctypes.data, nb, nsites,
                  c.ctypes.data, s.ctypes.data, 1 if inverse else 0,
                  D.ctypes.data)
    return D


def dedup_pairs(a: np.ndarray, b: np.ndarray):
    """Native duplicate-pair mask; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(a)
    aa = np.ascontiguousarray(a, dtype=np.int64)
    bb = np.ascontiguousarray(b, dtype=np.int64)
    keep = np.empty(n, dtype=np.uint8)
    lib.dedup_pairs(aa.ctypes.data, bb.ctypes.data, n, keep.ctypes.data)
    return keep.astype(bool)
