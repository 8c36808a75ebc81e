"""Native (C++) components, with pure-Python fallbacks.

``lap_solve(cost)`` solves the rectangular linear assignment problem
(n_rows <= n_cols, minimization) and returns (row_indices, col4row), the same
contract as ``scipy.optimize.linear_sum_assignment``.

The C++ shortest-augmenting-path solver in ``lapjv.cpp`` is compiled lazily
with g++ on first use (toolchain is assumed present on dev machines); if the
shared library cannot be built or loaded, scipy's solver is used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lapjv.cpp")
_LIB = os.path.join(_HERE, "liblapjv.so")

_lib = None
_lib_failed = False


def _load_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
        lib = ctypes.CDLL(_LIB)
        lib.lap_solve_f64.restype = ctypes.c_int
        lib.lap_solve_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def lap_solve(cost: np.ndarray):
    """Solve min-cost assignment for cost [n_rows, n_cols] with n_rows <= n_cols.

    Returns (row_ind, col_ind) like scipy.optimize.linear_sum_assignment.
    """
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n_rows, n_cols = cost.shape
    lib = _load_lib()
    if lib is not None and n_rows <= n_cols:
        out = np.zeros(n_rows, dtype=np.int64)
        rc = lib.lap_solve_f64(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n_rows,
            n_cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if rc == 0:
            return np.arange(n_rows), out
    from scipy.optimize import linear_sum_assignment

    return linear_sum_assignment(cost)
