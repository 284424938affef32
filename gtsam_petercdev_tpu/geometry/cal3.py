"""Calibration models (reference: gtsam/geometry/Cal3*.{h,cpp}).

Each model is a flat parameter vector + pure batched calibrate/uncalibrate
maps. Implemented: Cal3_S2 (5: fx fy s u0 v0), Cal3f (1: f, fixed center),
Cal3Bundler (3: f k1 k2, fixed center), Cal3DS2 (9: fx fy s u0 v0 k1 k2 p1 p2).
uncalibrate: intrinsic (normalized) -> image coords; calibrate: inverse.
"""

from __future__ import annotations

import jax.numpy as jnp


# --- Cal3_S2: [fx, fy, s, u0, v0] -------------------------------------------

CAL3_S2_DIM = 5


def cal3_s2(fx, fy, s, u0, v0, dtype=jnp.float32):
    return jnp.asarray([fx, fy, s, u0, v0], dtype=dtype)


def cal3_s2_uncalibrate(k, p):
    fx, fy, s, u0, v0 = (k[..., i] for i in range(5))
    x, y = p[..., 0], p[..., 1]
    return jnp.stack([fx * x + s * y + u0, fy * y + v0], axis=-1)


def cal3_s2_calibrate(k, pi):
    fx, fy, s, u0, v0 = (k[..., i] for i in range(5))
    u, v = pi[..., 0], pi[..., 1]
    y = (v - v0) / fy
    x = (u - u0 - s * y) / fx
    return jnp.stack([x, y], axis=-1)


# --- Cal3Bundler: [f, k1, k2] (u0=v0=0 fixed) --------------------------------

CAL3_BUNDLER_DIM = 3


def cal3_bundler(f, k1, k2, dtype=jnp.float32):
    return jnp.asarray([f, k1, k2], dtype=dtype)


def cal3_bundler_uncalibrate(k, p):
    """(Cal3Bundler.cpp:64-90): pi = f * (1 + k1 r + k2 r^2) * p, r = |p|^2."""
    f, k1, k2 = k[..., 0], k[..., 1], k[..., 2]
    x, y = p[..., 0], p[..., 1]
    r = x * x + y * y
    g = 1.0 + (k1 + k2 * r) * r
    return jnp.stack([f * g * x, f * g * y], axis=-1)


def cal3_bundler_calibrate(k, pi, iterations: int = 10):
    """Invert the distortion by fixed-point iteration (Cal3Bundler.cpp:93)."""
    f, k1, k2 = k[..., 0], k[..., 1], k[..., 2]
    px, py = pi[..., 0] / f, pi[..., 1] / f
    x, y = px, py
    for _ in range(iterations):
        r = x * x + y * y
        g = 1.0 + (k1 + k2 * r) * r
        x, y = px / g, py / g
    return jnp.stack([x, y], axis=-1)


# --- Cal3DS2: [fx, fy, s, u0, v0, k1, k2, p1, p2] ----------------------------

CAL3_DS2_DIM = 9


def cal3_ds2_uncalibrate(k, p):
    """Radial-tangential distortion (Cal3DS2_Base.cpp)."""
    fx, fy, s, u0, v0 = (k[..., i] for i in range(5))
    k1, k2, p1, p2 = (k[..., i] for i in range(5, 9))
    x, y = p[..., 0], p[..., 1]
    xy = x * y
    xx, yy = x * x, y * y
    r2 = xx + yy
    g = 1.0 + k1 * r2 + k2 * r2 * r2
    dx = 2.0 * p1 * xy + p2 * (r2 + 2.0 * xx)
    dy = 2.0 * p2 * xy + p1 * (r2 + 2.0 * yy)
    xd, yd = g * x + dx, g * y + dy
    return jnp.stack([fx * xd + s * yd + u0, fy * yd + v0], axis=-1)
