"""Unit3: directions on S^2 with a 2D tangent chart.

Reference: gtsam/geometry/Unit3.{h,cpp} — unit vectors with a deterministic
orthonormal basis B(p) [3,2] and the sphere exponential retract
(Unit3::retract, EXPMAP mode). Everything here is branch-free (jnp.where
instead of the reference's axis-selection branches) so it vmaps/jits.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM = 2
_EPS = 1e-12


def normalize(p):
    return p / jnp.linalg.norm(p, axis=-1, keepdims=True)


def basis(p):
    """Deterministic orthonormal basis B [..., 3, 2] of the tangent plane
    (Unit3::basis: cross with the axis most orthogonal to p)."""
    ax = jnp.abs(p)
    # pick e_k with smallest |p_k| — branch-free one-hot
    k = jnp.argmin(ax, axis=-1)
    e = jnp.eye(3, dtype=p.dtype)[k]
    b1 = jnp.cross(p, e)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(p, b1)
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    return jnp.stack([b1, b2], axis=-1)


def retract(p, xi):
    """Sphere expmap: cos(|xi|) p + sin(|xi|) (B xi)/|xi| (Unit3::retract)."""
    d = jnp.einsum("...ij,...j->...i", basis(p), xi)
    th = jnp.linalg.norm(xi, axis=-1, keepdims=True)
    th_safe = jnp.where(th < _EPS, _EPS, th)
    sinc = jnp.sin(th_safe) / th_safe
    out = jnp.cos(th) * p + sinc * d
    return normalize(out)


def local(p, q):
    """Inverse retract (Unit3::localCoordinates): log map on the sphere."""
    B = basis(p)
    cos_t = jnp.clip(jnp.sum(p * q, axis=-1, keepdims=True), -1.0, 1.0)
    # component of q orthogonal to p
    perp = q - cos_t * p
    sin_t = jnp.linalg.norm(perp, axis=-1, keepdims=True)
    th = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(sin_t < _EPS, 1.0, th / jnp.where(sin_t < _EPS, 1.0, sin_t))
    v = scale * perp
    return jnp.einsum("...ij,...i->...j", B, v)


def identity(dtype=jnp.float32):
    return jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
