"""Native (C++) runtime components with ctypes bindings.

The compute path is JAX/XLA/Pallas; the host runtime around it is
native where the reference's is (scan parsing here; the reference's
readers are per-format C++ plugins).  The shared library is built on
first use with g++ -O2 and cached next to the source; numpy fallbacks
keep everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastscan.cpp")
_LIB = os.path.join(_DIR, "libfastscan.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_LIB)
            lib.parse_table.restype = ctypes.POINTER(ctypes.c_double)
            lib.parse_table.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.free_table.argtypes = [ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _build_failed = True
    return _lib


def parse_table(path: str, skip_lines: int = 0) -> np.ndarray | None:
    """Parse a whitespace float table with the native reader.

    Returns [rows, cols] float64, or None if the native library is
    unavailable (callers fall back to numpy.loadtxt)."""
    lib = _load()
    if lib is None:
        return None
    rows = ctypes.c_int64(0)
    cols = ctypes.c_int32(0)
    ptr = lib.parse_table(
        path.encode(), skip_lines, ctypes.byref(rows), ctypes.byref(cols)
    )
    if not ptr:
        if cols.value == 0 and rows.value == 0:
            # empty file or read failure: distinguish via existence
            if os.path.exists(path):
                return np.zeros((0, max(cols.value, 0)), np.float64)
            return None
        return np.zeros((0, cols.value), np.float64)
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    finally:
        lib.free_table(ptr)
    return arr.reshape(rows.value, cols.value)
