"""ctypes loader/builder for the native host runtime (native/src/gie_host.cpp).

Builds libgie_host.so on first use with the system g++ (no pybind11 in this
image); every consumer has a pure-python fallback, so a missing toolchain
degrades gracefully.
"""
from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = Path(__file__).resolve().parent.parent / "native" / "src" / "gie_host.cpp"
_BUILD = Path(__file__).resolve().parent.parent / "native" / "build"


def _build() -> Path | None:
    so = _BUILD / "libgie_host.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    _BUILD.mkdir(parents=True, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(so)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
    except Exception:
        return None
    return so


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None

        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_i32_p = ctypes.POINTER(ctypes.c_int32)
        c_i16_p = ctypes.POINTER(ctypes.c_int16)
        c_u8_p = ctypes.POINTER(ctypes.c_uint8)
        c_i8_p = ctypes.POINTER(ctypes.c_int8)

        lib.gie_gt_check.restype = ctypes.c_int
        lib.gie_gt_check.argtypes = [c_float_p, ctypes.c_int, c_float_p,
                                     ctypes.c_int, c_float_p, c_float_p]
        lib.gie_dbscan_aabb.restype = ctypes.c_int
        lib.gie_dbscan_aabb.argtypes = [c_float_p, ctypes.c_int, ctypes.c_float,
                                        ctypes.c_int, ctypes.c_int, c_float_p,
                                        ctypes.c_int, c_i32_p]
        lib.gie_cloud_to_rings.restype = None
        lib.gie_cloud_to_rings.argtypes = [c_float_p, c_i32_p, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_float,
                                           c_float_p]
        lib.gie_mirror_new.restype = ctypes.c_void_p
        lib.gie_mirror_free.argtypes = [ctypes.c_void_p]
        lib.gie_mirror_size.restype = ctypes.c_int
        lib.gie_mirror_size.argtypes = [ctypes.c_void_p]
        lib.gie_mirror_ingest.restype = None
        lib.gie_mirror_ingest.argtypes = [ctypes.c_void_p, c_i32_p, c_u8_p,
                                          c_i8_p, c_i32_p, c_i16_p, ctypes.c_int]
        lib.gie_mirror_extract_cloud.restype = ctypes.c_int
        lib.gie_mirror_extract_cloud.argtypes = [ctypes.c_void_p, ctypes.c_int8,
                                                 ctypes.c_float, c_float_p,
                                                 ctypes.c_int]
        lib.gie_mirror_extract_edt.restype = ctypes.c_int
        lib.gie_mirror_extract_edt.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                               ctypes.c_float, c_float_p,
                                               c_float_p, ctypes.c_int]
        _lib = lib
        return _lib


def _fp(arr):
    import numpy as np

    return np.ascontiguousarray(arr, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float)
    )
