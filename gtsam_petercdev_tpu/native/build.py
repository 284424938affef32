"""Build + load the native library (ctypes, no pybind11 dependency)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "io_native.cpp")
_LIB = os.path.join(_DIR, "_io_native.so")
_LOCK = threading.Lock()
_CACHED = None
_FAILED = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)


def load_library():
    """Compile (if stale) and dlopen the native library; None on failure."""
    global _CACHED, _FAILED
    with _LOCK:
        if _CACHED is not None:
            return _CACHED
        if _FAILED:
            return None
        try:
            if _needs_build():
                subprocess.run(
                    [
                        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                        _SRC, "-o", _LIB,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_LIB)
            lib.g2o_parse.restype = ctypes.c_void_p
            lib.g2o_parse.argtypes = [ctypes.c_char_p]
            lib.g2o_free.argtypes = [ctypes.c_void_p]
            lib.g2o_counts.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            vp = ctypes.c_void_p
            lib.g2o_get_v2.restype = None
            lib.g2o_get_v2.argtypes = [vp, vp, vp]
            lib.g2o_get_v3.restype = None
            lib.g2o_get_v3.argtypes = [vp, vp, vp, vp]
            lib.g2o_get_e2.restype = None
            lib.g2o_get_e2.argtypes = [vp, vp, vp, vp]
            lib.g2o_get_e3.restype = None
            lib.g2o_get_e3.argtypes = [vp, vp, vp, vp, vp, vp]
            lib.bal_parse.restype = ctypes.c_void_p
            lib.bal_parse.argtypes = [ctypes.c_char_p]
            lib.bal_free.argtypes = [ctypes.c_void_p]
            lib.bal_counts.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.bal_get.restype = None
            lib.bal_get.argtypes = [vp, vp, vp, vp, vp, vp]
            _CACHED = lib
            return lib
        except Exception:
            _FAILED = True
            return None
