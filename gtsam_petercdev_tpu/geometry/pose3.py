"""SE(3): rigid transforms.

Representation: a NamedTuple pytree Pose3(R=[...,3,3], t=[...,3]).
Tangent convention matches the reference: xi = (omega, v) — rotation first
(gtsam/geometry/Pose3.h:142-224). Retract is the full exponential map
(reference flag GTSAM_POSE3_EXPMAP, default ON).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import so3


class Pose3(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]


DIM = 6


def identity(dtype=jnp.float32):
    return Pose3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype))


def compose(p1: Pose3, p2: Pose3) -> Pose3:
    return Pose3(p1.R @ p2.R, so3.rotate(p1.R, p2.t) + p1.t)


def inverse(p: Pose3) -> Pose3:
    Rinv = so3.inverse(p.R)
    return Pose3(Rinv, -so3.rotate(Rinv, p.t))


def between(p1: Pose3, p2: Pose3) -> Pose3:
    """p1^{-1} p2."""
    R1inv = so3.inverse(p1.R)
    return Pose3(R1inv @ p2.R, so3.rotate(R1inv, p2.t - p1.t))


def expmap(xi) -> Pose3:
    """xi [...,6] = (omega, v) -> Pose3. t = Jl(omega) v (SE(3) exp)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3.expmap(w)
    t = jnp.einsum("...ij,...j->...i", so3.left_jacobian(w), v)
    return Pose3(R, t)


def logmap(p: Pose3):
    """Pose3 -> xi [...,6] = (omega, v)."""
    w = so3.logmap(p.R)
    v = jnp.einsum("...ij,...j->...i", so3.left_jacobian_inverse(w), p.t)
    return jnp.concatenate([w, v], axis=-1)


def retract(p: Pose3, xi) -> Pose3:
    return compose(p, expmap(xi))


def local(p1: Pose3, p2: Pose3):
    return logmap(between(p1, p2))


def adjoint_map(p: Pose3):
    """6x6 Adjoint: Ad_T = [[R, 0], [hat(t) R, R]] (Pose3.h AdjointMap)."""
    zero = jnp.zeros_like(p.R)
    top = jnp.concatenate([p.R, zero], axis=-1)
    bot = jnp.concatenate([so3.hat(p.t) @ p.R, p.R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_from(p: Pose3, point):
    """Map a point from the pose frame to world: R p + t."""
    return so3.rotate(p.R, point) + p.t


def transform_to(p: Pose3, point):
    """Map a world point into the pose frame: R^T (p - t)."""
    return so3.unrotate(p.R, point - p.t)


def stack(poses):
    """Stack a python list of Pose3 into one batched Pose3."""
    return Pose3(
        jnp.stack([p.R for p in poses], axis=0),
        jnp.stack([p.t for p in poses], axis=0),
    )


def index(p: Pose3, i) -> Pose3:
    return Pose3(p.R[i], p.t[i])


def matrix(p: Pose3):
    """Homogeneous 4x4 matrix."""
    batch = p.t.shape[:-1]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=p.t.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([p.R, p.t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
