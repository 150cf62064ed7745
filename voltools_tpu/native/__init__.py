"""Native (C++) CPU backend bindings.

Builds ``affine_cpu.cpp`` into a shared library on first use (g++, cached
next to the source) and binds it with ctypes.  Provides the multithreaded
host-side affine resample + B-spline prefilter used by ``device='cpu'`` with
``backend='native'``.  Falls back silently if no compiler is available —
callers must check :func:`available`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "affine_cpu.cpp")
_LIB_PATH = os.path.join(_HERE, "_affine_cpu.so")

_lock = threading.Lock()
_lib = None
_build_error = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.vt_affine_transform.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int,
            ]
            lib.vt_affine_transform.restype = None
            lib.vt_bspline_prefilter.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ]
            lib.vt_bspline_prefilter.restype = None
            _lib = lib
        except Exception as exc:  # pragma: no cover - no toolchain
            _build_error = exc
        return _lib


def available() -> bool:
    return _load() is not None


def _n_threads() -> int:
    return max(1, os.cpu_count() or 1)


def bspline_prefilter(volume: np.ndarray) -> np.ndarray:
    """Mirror-boundary cubic B-spline prefilter (in a copy)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native backend unavailable: {_build_error}")
    out = np.ascontiguousarray(volume, dtype=np.float32).copy()
    lib.vt_bspline_prefilter(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *map(ctypes.c_int64, out.shape), _n_threads())
    return out


def affine_transform(volume: np.ndarray, matrix: np.ndarray,
                     interpolation: str = "linear", mode: str = "constant",
                     cval: float = 0.0, out_shape=None,
                     output: np.ndarray = None) -> np.ndarray:
    """Native equivalent of scipy.ndimage.affine_transform for our modes."""
    from ..ops.interpolation import needs_prefilter, spline_order

    lib = _load()
    if lib is None:
        raise RuntimeError(f"native backend unavailable: {_build_error}")

    vol = np.ascontiguousarray(volume, dtype=np.float32)
    if needs_prefilter(interpolation):
        vol = bspline_prefilter(vol)
    order = spline_order(interpolation)

    if out_shape is None:
        out_shape = vol.shape
    if output is None:
        output = np.empty(tuple(out_shape), dtype=np.float32)
    else:
        # the C kernel writes float32 through a raw pointer; anything else
        # would be silently reinterpreted
        if output.dtype != np.float32:
            raise ValueError(
                f"output must be float32 for the native backend, got "
                f"{output.dtype}")
        if not output.flags["C_CONTIGUOUS"]:
            raise ValueError("output must be C-contiguous for the native "
                             "backend")
        if tuple(output.shape) != tuple(out_shape):
            raise ValueError(
                f"output shape {output.shape} != expected {tuple(out_shape)}")

    m = np.ascontiguousarray(np.asarray(matrix, dtype=np.float64)[:3, :4])
    lib.vt_affine_transform(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *map(ctypes.c_int64, vol.shape),
        output.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        *map(ctypes.c_int64, output.shape),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        order, 1 if mode == "border" else 0, ctypes.c_float(cval),
        _n_threads())
    return output
