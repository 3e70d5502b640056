"""ctypes bindings for the native C++ LAP solver (native/lap.cc).

Builds the shared library on first use (g++, cached next to the source) and
exposes `solve` / `solve_batch` with the same contract as
dpft_tpu.ops.hungarian.solve: cost (R, C) with R <= C -> col4row (R,).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), "..", "..",
                                   "native"))
_SRC = osp.join(_NATIVE_DIR, "lap.cc")
_LIB = osp.join(_NATIVE_DIR, "liblap.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    proc = subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
        capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"Building the native LAP solver failed (exit "
            f"{proc.returncode}):\n{proc.stderr}")


def load_library() -> ctypes.CDLL:
    """Loads (building if needed) the native LAP library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.lap_solve.restype = ctypes.c_int
        lib.lap_solve.argtypes = [
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib.lap_solve_batch.restype = ctypes.c_int
        lib.lap_solve_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return lib


def solve(cost: np.ndarray) -> np.ndarray:
    """Min-cost assignment: cost (R, C), R <= C -> col4row (R,) int32."""
    lib = load_library()
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    R, C = cost.shape
    out = np.empty(R, dtype=np.int32)
    rc = lib.lap_solve(R, C, cost, out)
    if rc != 0:
        raise ValueError("LAP solve failed (infeasible or invalid input)")
    return out


def solve_batch(costs: np.ndarray) -> np.ndarray:
    """Batched solve: (B, R, C) -> (B, R) int32."""
    lib = load_library()
    costs = np.ascontiguousarray(costs, dtype=np.float64)
    B, R, C = costs.shape
    out = np.empty((B, R), dtype=np.int32)
    rc = lib.lap_solve_batch(B, R, C, costs, out)
    if rc != 0:
        raise ValueError("LAP solve failed (infeasible or invalid input)")
    return out
