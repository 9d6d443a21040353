"""Native (C++) symbolic-analysis backend, loaded via ctypes.

Builds lazily with g++ on first use (cached .so); every entry point has a
pure-Python fallback in sparse/structure.py, so the framework works without a
toolchain. Mirrors the role of the reference's C++ extlib symbolic layer
(extlib/baspacho_solver.cpp:326)."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SO = _HERE / "_symbolic.so"
_SRC = _HERE / "symbolic.cpp"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=240,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.symbolic_analyze.restype = ctypes.c_void_p
    lib.symbolic_analyze.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
    ]
    lib.symbolic_nnz.restype = ctypes.c_int64
    lib.symbolic_nnz.argtypes = [ctypes.c_void_p]
    ptr = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.symbolic_fetch.restype = None
    lib.symbolic_fetch.argtypes = [ctypes.c_void_p, ptr, ptr, ptr, ptr, ptr]
    lib.symbolic_free.restype = None
    lib.symbolic_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


_MODES = {"natural": 0, "amd": 1, "nd": 2}


def native_symbolic(n: int, pairs, ordering: str):
    """Returns (perm, col_rows list, etree, level_of) or None if unavailable."""
    lib = load()
    if lib is None or ordering not in _MODES:
        return None
    edges = np.array(sorted(pairs), dtype=np.int64).reshape(-1, 2)
    edges_flat = np.ascontiguousarray(edges.reshape(-1))
    handle = lib.symbolic_analyze(n, len(edges), edges_flat, _MODES[ordering])
    if not handle:
        return None
    try:
        nnz = lib.symbolic_nnz(handle)
        perm = np.empty(n, np.int64)
        col_ptr = np.empty(n + 1, np.int64)
        col_rows = np.empty(nnz, np.int64)
        etree = np.empty(n, np.int64)
        level_of = np.empty(n, np.int64)
        lib.symbolic_fetch(handle, perm, col_ptr, col_rows, etree, level_of)
    finally:
        lib.symbolic_free(handle)
    cols = [col_rows[col_ptr[j]:col_ptr[j + 1]] for j in range(n)]
    return perm, cols, etree, level_of
