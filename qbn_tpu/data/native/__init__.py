"""Native (C++) host-side image pipeline with transparent numpy fallback.

The shared library is compiled on first use with the container's g++
(no pip/pybind11 needed: plain C ABI + ctypes). When compilation or loading
fails, callers fall back to the numpy implementations in
qbn_tpu.data.loaders / qbn_tpu.data.distortions — identical semantics,
verified by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "augment.cpp")
_SO = os.path.join(_DIR, "libqbn_augment.so")

_lib = None
_tried = False


def _build() -> bool:
    # -ffp-contract=off: no FMA contraction in the rotate coordinate map —
    # its doubles must round exactly like numpy's separate mul/add ops so
    # nearest-neighbour ties resolve identically (see qbn_rotate)
    cmd = ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
           "-fPIC", "-std=c++17", "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native augment build failed (%s); using numpy "
                    "fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        log.warning("native augment load failed (%s)", e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ints = [ctypes.c_int] * 4
    lib.qbn_cifar_augment.argtypes = [f32p, f32p, *ints, i32p, i32p, u8p]
    lib.qbn_rotate.argtypes = [f32p, f32p, *ints, ctypes.c_float]
    lib.qbn_hshift.argtypes = [f32p, f32p, *ints, ctypes.c_int]
    lib.qbn_brighten.argtypes = [f32p, f32p, *ints, ctypes.c_float]
    lib.qbn_normalize.argtypes = [f32p, f32p, *ints, f32p, f32p]
    _lib = lib
    return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return get_lib() is not None


def cifar_augment(x: np.ndarray, ys: np.ndarray, xs: np.ndarray,
                  flip: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    n, h, w, c = x.shape
    lib.qbn_cifar_augment(
        _fp(x), _fp(out), n, h, w, c,
        np.ascontiguousarray(ys, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(xs, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(flip, np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)))
    return out


def rotate(x: np.ndarray, degrees: float) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    lib.qbn_rotate(_fp(x), _fp(out), *x.shape, ctypes.c_float(degrees))
    return out


def hshift(x: np.ndarray, tx: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    lib.qbn_hshift(_fp(x), _fp(out), *x.shape, int(tx))
    return out


def brighten(x: np.ndarray, factor: float) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    lib.qbn_brighten(_fp(x), _fp(out), *x.shape, ctypes.c_float(factor))
    return out


def normalize(x: np.ndarray, mean: np.ndarray,
              std: np.ndarray) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty_like(x)
    c = x.shape[-1]
    mean = np.ascontiguousarray(np.broadcast_to(mean, (c,)), np.float32)
    std = np.ascontiguousarray(np.broadcast_to(std, (c,)), np.float32)
    lib.qbn_normalize(_fp(x), _fp(out), *x.shape, _fp(mean), _fp(std))
    return out
