"""ctypes bindings for the native radar reduction (native/radar_reduce.cc).

Host-side SIMD implementation of the tesseract -> (RA, EA) reduction
(reference hot loop src/dprt/datasets/kradar/processor.py:588-633, same
contract as dpft_tpu.ops.radar_reduce.reduce_tesseract_np). Intended for
ETL on hosts where the accelerator is remote — uploading a ~260 MB cube
through a tunneled link costs more than reducing it locally — or absent.

Builds the shared library on first use (g++ -Ofast -march=native, cached
next to the source). -Ofast is sound here because radar powers are
strictly positive (asserted below), so log10 never produces NaN and the
finite-math min/max assumptions hold; log10f auto-vectorizes through
glibc's libmvec under __FAST_MATH__.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from dpft_tpu.data.kradar import radar_info
from dpft_tpu.ops.radar_reduce import _RANGE_CROP

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), "..", "..",
                                   "native"))
_SRC = osp.join(_NATIVE_DIR, "radar_reduce.cc")
_LIB = osp.join(_NATIVE_DIR, "libradar.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    # Compile and link SEPARATELY: linking with -Ofast would pull in
    # crtfastmath.o, whose constructor flips the PROCESS-WIDE FTZ/DAZ
    # MXCSR bits when the .so loads — silently changing subnormal
    # semantics for every other library in the interpreter (observed as
    # numpy's "smallest subnormal is zero" warning). Fast-math stays a
    # compile-time property of this kernel only.
    obj = _LIB + ".o"
    for cmd in (
        ["g++", "-Ofast", "-march=native", "-fPIC", "-c", _SRC, "-o", obj],
        ["g++", "-shared", "-o", _LIB, obj, "-lmvec", "-lm"],
    ):
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"Building the native radar reduction failed (exit "
                f"{proc.returncode}):\n{proc.stderr}")
    if osp.exists(obj):
        os.remove(obj)


def load_library() -> ctypes.CDLL:
    """Loads (building if needed) the native reduction library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not osp.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.radar_reduce_f32.restype = ctypes.c_int
        lib.radar_reduce_f32.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return lib


def reduce_tesseract_native(tesseract: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """(D, R, E, A) positive power cube -> (ra (R, A, 6), ea (E, A, 6)).

    Same semantics as reduce_tesseract_np (median-of-median compositions,
    EA doppler median-is-mean quirk, range crop on the EA plane only).
    """
    tesseract = np.ascontiguousarray(tesseract, dtype=np.float32)
    if tesseract.ndim != 4:
        raise ValueError(f"expected a 4D cube, got {tesseract.shape}")
    D, R, E, A = tesseract.shape
    # -Ofast precondition: log10 of a non-positive power would be -inf/NaN
    # under finite-math assumptions. The NumPy path would produce the same
    # garbage silently; fail loudly instead.
    if tesseract.min() <= 0.0:
        raise ValueError("radar powers must be strictly positive")
    raster = np.ascontiguousarray(
        np.asarray(radar_info.doppler_raster, np.float32))
    if raster.shape[0] < D:
        raise ValueError(
            f"doppler raster ({raster.shape[0]}) shorter than D={D}")
    crop_lo = min(_RANGE_CROP[0], R)
    crop_hi = min(_RANGE_CROP[1], R)
    if crop_hi <= crop_lo:  # degenerate tiny cubes: no crop
        crop_lo, crop_hi = 0, R
    ra = np.empty((R, A, 6), dtype=np.float32)
    ea = np.empty((E, A, 6), dtype=np.float32)
    rc = load_library().radar_reduce_f32(
        tesseract, D, R, E, A, crop_lo, crop_hi, raster, ra, ea)
    if rc != 0:
        raise ValueError(f"native radar reduction failed (rc={rc})")
    return ra, ea
