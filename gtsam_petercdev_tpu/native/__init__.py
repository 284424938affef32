"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime around the numeric core is C++ (dataset I/O,
orderings, containers); this package holds the TPU framework's native
equivalents. Components auto-build on first use with g++ (single
translation units, ~1s) and fall back to pure-Python implementations when a
toolchain is unavailable.
"""

from gtsam_petercdev_tpu.native.build import load_library  # noqa: F401
