"""
ctypes bindings for the native fastvol library (native/fastvol.cpp).

Provides a fast composed trilinear/nearest resample for the host
preprocessing path; transparently built with g++ on first use and falling
back to scipy.ndimage when no compiler is available.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from adell_mri_tpu.utils import get_logger

logger = get_logger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "fastvol.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libfastvol.so")

_lib: Optional[ctypes.CDLL] = None
_checked = False
# first use can come from several DataLoader prefetch threads at once;
# without the lock two g++ subprocesses would write the same .so
_load_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    with _load_lock:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    try:
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            # build to a temp path + rename so an interrupted compile can
            # never leave a truncated .so for the next process to dlopen
            tmp = _LIB + f".tmp{os.getpid()}"
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    "-o", tmp, _SRC,
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, _LIB)
        lib = ctypes.CDLL(_LIB)
        for name in ("resample_trilinear_f32", "resample_nearest_f32"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_float,
            ]
        lib.minmax_scale_f32.restype = ctypes.c_int
        lib.minmax_scale_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
        ]
        _lib = lib
        logger.info("fastvol native library loaded")
    except Exception as e:  # no compiler / load failure -> scipy fallback
        logger.info("fastvol unavailable (%s); using scipy fallback", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def resample_affine_grid(
    src: np.ndarray,
    dst_shape: Sequence[int],
    zoom: Sequence[float],
    offset: Sequence[float],
    order: int = 1,
    cval: float = 0.0,
) -> np.ndarray:
    """
    dst[i,j,k] = src((i+offset)/zoom) with trilinear (order=1) or nearest
    (order=0) interpolation. Native kernel when available; the kernel
    computes coordinates with the same double arithmetic as the scipy
    fallback so half-integer nearest-neighbour ties agree.
    """
    lib = _load()
    src = np.ascontiguousarray(src, np.float32)
    dst = np.empty(tuple(int(s) for s in dst_shape), np.float32)
    if lib is not None:
        fn = (
            lib.resample_trilinear_f32 if order >= 1 else lib.resample_nearest_f32
        )
        fn(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            *[ctypes.c_int64(int(s)) for s in src.shape],
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            *[ctypes.c_int64(int(s)) for s in dst.shape],
            *[ctypes.c_double(float(z)) for z in zoom],
            *[ctypes.c_double(float(o)) for o in offset],
            ctypes.c_float(cval),
        )
        return dst
    from scipy import ndimage

    coords = np.indices(tuple(dst_shape)).astype(np.float64)
    for d in range(3):
        coords[d] = (coords[d] + offset[d]) / zoom[d]
    return ndimage.map_coordinates(
        src, coords, order=min(order, 1), cval=cval, mode="constant"
    ).astype(np.float32)


def minmax_scale_inplace(data: np.ndarray, lo: float = 0.0, hi: float = 1.0):
    lib = _load()
    if lib is not None and data.dtype == np.float32 and data.flags["C_CONTIGUOUS"]:
        lib.minmax_scale_f32(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(data.size),
            ctypes.c_float(lo),
            ctypes.c_float(hi),
        )
        return data
    dmin, dmax = data.min(), data.max()
    span = max(dmax - dmin, 1e-6)
    data[...] = (data - dmin) / span * (hi - lo) + lo
    return data
