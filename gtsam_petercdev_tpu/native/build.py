"""Build + load the native library (ctypes, no pybind11 dependency)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "io_native.cpp")
_LIB = os.path.join(_DIR, "_io_native.so")
_SOLVE_SRC = os.path.join(_DIR, "src", "solve_native.cpp")
_SOLVE_LIB = os.path.join(_DIR, "_solve_native.so")
_LOCK = threading.Lock()
_CACHED = None
_FAILED = False
_SOLVE_CACHED = None
_SOLVE_FAILED = False


def _needs_build() -> bool:
    if not os.path.exists(_LIB):
        return True
    return os.path.getmtime(_SRC) > os.path.getmtime(_LIB)


def load_solve_library():
    """Compile (if stale) and dlopen the native solver library.

    Hosts the wildfire back-substitution sweep (solve_native.cpp) used by
    the numpy incremental backend; None on failure (callers fall back to
    the Python sweep)."""
    global _SOLVE_CACHED, _SOLVE_FAILED
    with _LOCK:
        if _SOLVE_CACHED is not None:
            return _SOLVE_CACHED
        if _SOLVE_FAILED:
            return None
        try:
            if (not os.path.exists(_SOLVE_LIB)) or os.path.getmtime(
                _SOLVE_SRC
            ) > os.path.getmtime(_SOLVE_LIB):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-funroll-loops", "-fPIC", "-shared", "-std=c++17",
                        _SOLVE_SRC, "-o", _SOLVE_LIB,
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(_SOLVE_LIB)
            vp = ctypes.c_void_p
            i64 = ctypes.c_int64
            lib.wildfire_sweep.restype = i64
            lib.wildfire_sweep.argtypes = [
                i64,                    # n_cap
                vp, vp, vp, vp,         # parent, alive, nf, ns
                vp, vp,                 # nfr, nsr (real counts)
                vp, vp, vp, vp,         # pL, pLinv, pW, pY
                vp, vp, vp, vp,         # fro_off, sep_off, fro_buf, sep_buf
                vp, i64, i64,           # x, d, xcap
                vp, i64,                # seeds, n_seeds
                ctypes.c_double,        # threshold
                vp, vp, vp,             # dirty, seed_mask, scratch
            ]
            lib.chol_bucket.restype = i64
            lib.chol_bucket.argtypes = [
                vp, vp,                          # Fm, gm
                i64, i64, i64, i64,              # B, m, nf, d
                ctypes.c_double,                 # eps
                vp, vp, vp, vp, vp, vp, vp,      # L, Linv, W, y, U, ug, work
            ]
            lib.scatter_add_rows.restype = None
            lib.scatter_add_rows.argtypes = [vp, vp, vp, i64, i64, i64]
            lib.eliminate_sweep.restype = i64
            lib.eliminate_sweep.argtypes = [
                vp, vp, i64, i64,                # pool, gp, d, n_levels
                vp, vp, vp, vp, vp,              # nf, ns, B, boff, goff
                vp, vp,                          # ext ptrs, extg ptrs
                vp, vp, vp, vp, vp, vp,          # payload ptr arrays
                ctypes.c_double, vp,             # eps, work
            ]
            _SOLVE_CACHED = lib
            return lib
        except Exception:
            _SOLVE_FAILED = True
            return None


_CCOLAMD_LIB = os.path.join(_DIR, "_ccolamd.so")
# CCOLAMD is third-party BSD SuiteSparse code, never vendored here: build
# from a source tree (GTSAM_TPU_CCOLAMD_ROOT env var, or a checkout of the
# reference next door) or fall back to the system libccolamd; on total
# failure best_ordering simply drops this candidate.
_CCOLAMD_ROOT = os.environ.get(
    "GTSAM_TPU_CCOLAMD_ROOT", "/root/reference/gtsam/3rdparty"
)
_CCOLAMD_SRC = os.path.join(_CCOLAMD_ROOT, "CCOLAMD/Source/ccolamd.c")
_CCOLAMD_INC = [
    os.path.join(_CCOLAMD_ROOT, "CCOLAMD/Include"),
    os.path.join(_CCOLAMD_ROOT, "SuiteSparse_config"),
]
_CCOLAMD_CACHED = None
_CCOLAMD_FAILED = False


def load_ccolamd():
    """Compile (from the reference's vendored SuiteSparse CCOLAMD — BSD
    third-party code, built in place, nothing copied into this repo) and
    dlopen the real constrained-COLAMD ordering backend. None on failure
    (best_ordering falls back to the other candidates)."""
    global _CCOLAMD_CACHED, _CCOLAMD_FAILED
    with _LOCK:
        if _CCOLAMD_CACHED is not None:
            return _CCOLAMD_CACHED
        if _CCOLAMD_FAILED:
            return None
        try:
            if os.path.exists(_CCOLAMD_SRC) and (
                (not os.path.exists(_CCOLAMD_LIB))
                or os.path.getmtime(_CCOLAMD_SRC)
                > os.path.getmtime(_CCOLAMD_LIB)
            ):
                subprocess.run(
                    ["gcc", "-O2", "-fPIC", "-shared"]
                    + [f"-I{p}" for p in _CCOLAMD_INC]
                    + [_CCOLAMD_SRC,
                       os.path.join(_CCOLAMD_ROOT,
                                    "SuiteSparse_config/"
                                    "SuiteSparse_config.c"),
                       "-o", _CCOLAMD_LIB],
                    check=True, capture_output=True, timeout=120,
                )
            if os.path.exists(_CCOLAMD_LIB):
                lib = ctypes.CDLL(_CCOLAMD_LIB)
            else:  # system SuiteSparse install
                from ctypes.util import find_library

                name = find_library("ccolamd")
                if name is None:
                    raise FileNotFoundError("ccolamd: no source, no system lib")
                lib = ctypes.CDLL(name)
            vp = ctypes.c_void_p
            ci = ctypes.c_int
            lib.ccolamd_recommended.restype = ctypes.c_size_t
            lib.ccolamd_recommended.argtypes = [ci, ci, ci]
            lib.ccolamd_set_defaults.restype = None
            lib.ccolamd_set_defaults.argtypes = [vp]
            lib.ccolamd.restype = ci
            lib.ccolamd.argtypes = [ci, ci, ci, vp, vp, vp, vp, vp]
            _CCOLAMD_CACHED = lib
            return lib
        except Exception:
            _CCOLAMD_FAILED = True
            return None


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
                        "g++", "-O3", "-march=native", "-funroll-loops", "-fPIC", "-shared", "-std=c++17",
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
