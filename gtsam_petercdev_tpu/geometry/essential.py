"""EssentialMatrix, OrientedPlane3, Line3 manifolds.

Reference: gtsam/geometry/EssentialMatrix.{h,cpp} (E = [t]x R, 5 dof:
rotation 3 + direction 2), OrientedPlane3.{h,cpp} (unit normal + distance,
3 dof), Line3.{h,cpp} (rotation + 2 offsets, 4 dof).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import so3, unit3


# --- EssentialMatrix ---------------------------------------------------------


class EssentialMatrix(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3] rotation 1R2
    t: jnp.ndarray  # [..., 3] unit translation direction


E_DIM = 5


def essential_from_pose(R, t):
    """From relative pose; t normalized (EssentialMatrix::FromPose3)."""
    return EssentialMatrix(R, unit3.normalize(t))


def essential_matrix(E: EssentialMatrix):
    """E = [t]x R (EssentialMatrix::matrix)."""
    return so3.hat(E.t) @ E.R


def essential_retract(E: EssentialMatrix, xi):
    """First 3 = rotation tangent, last 2 = direction tangent
    (EssentialMatrix::retract)."""
    return EssentialMatrix(
        so3.retract(E.R, xi[..., :3]), unit3.retract(E.t, xi[..., 3:])
    )


def essential_local(a: EssentialMatrix, b: EssentialMatrix):
    return jnp.concatenate(
        [so3.local(a.R, b.R), unit3.local(a.t, b.t)], axis=-1
    )


def epipolar_error(E: EssentialMatrix, pA, pB):
    """Algebraic epipolar residual pA_h^T E pB_h (EssentialMatrix::error).

    pA, pB: [..., 2] normalized (calibrated) image points."""
    ones = jnp.ones(pA.shape[:-1] + (1,), dtype=pA.dtype)
    va = jnp.concatenate([pA, ones], axis=-1)
    vb = jnp.concatenate([pB, ones], axis=-1)
    Em = essential_matrix(E)
    return jnp.einsum("...i,...ij,...j->...", va, Em, vb)


def essential_identity(dtype=jnp.float32):
    return EssentialMatrix(jnp.eye(3, dtype=dtype), unit3.identity(dtype))


# --- OrientedPlane3 ----------------------------------------------------------


class OrientedPlane3(NamedTuple):
    n: jnp.ndarray  # [..., 3] unit normal
    d: jnp.ndarray  # [...] distance from origin


P_DIM = 3


def plane_from_coeffs(a, b, c, d):
    """ax + by + cz + d = 0 normalized (OrientedPlane3 ctor)."""
    n = jnp.stack([a, b, c], axis=-1)
    norm = jnp.linalg.norm(n, axis=-1)
    return OrientedPlane3(n / norm[..., None], d / norm)


def plane_retract(p: OrientedPlane3, xi):
    return OrientedPlane3(unit3.retract(p.n, xi[..., :2]), p.d + xi[..., 2])


def plane_local(a: OrientedPlane3, b: OrientedPlane3):
    return jnp.concatenate(
        [unit3.local(a.n, b.n), (b.d - a.d)[..., None]], axis=-1
    )


def plane_transform(p: OrientedPlane3, pose_R, pose_t):
    """Plane expressed in the frame of pose (OrientedPlane3::transform,
    OrientedPlane3.cpp): with x = R y + t, n.x + d = (R^T n).y + (d + n.t),
    so n' = R^T n, d' = d + n . t."""
    n_new = so3.unrotate(pose_R, p.n)
    d_new = p.d + jnp.sum(p.n * pose_t, axis=-1)
    return OrientedPlane3(n_new, d_new)


def plane_distance(p: OrientedPlane3, point):
    return jnp.sum(p.n * point, axis=-1) + p.d


def plane_identity(dtype=jnp.float32):
    return OrientedPlane3(unit3.identity(dtype), jnp.zeros((), dtype=dtype))


# --- Line3 -------------------------------------------------------------------


class Line3(NamedTuple):
    """Line through R*(a,b,0)... parameterized as rotation R (line direction
    = R e_z) + (a, b) offsets in the rotated xy-plane (Line3.h)."""

    R: jnp.ndarray  # [..., 3, 3]
    a: jnp.ndarray  # [...]
    b: jnp.ndarray  # [...]


L_DIM = 4


def line_retract(l: Line3, xi):
    """Tangent = (w1, w2, da, db): rotation about x,y only (z rotation is
    gauge) + offset increments (Line3::retract)."""
    w = jnp.stack(
        [xi[..., 0], xi[..., 1], jnp.zeros_like(xi[..., 0])], axis=-1
    )
    return Line3(l.R @ so3.expmap(w), l.a + xi[..., 2], l.b + xi[..., 3])


def line_local(x: Line3, y: Line3):
    w = so3.logmap(so3.inverse(x.R) @ y.R)
    return jnp.stack(
        [w[..., 0], w[..., 1], y.a - x.a, y.b - x.b], axis=-1
    )


def line_point(l: Line3, lam):
    """Point on the line at parameter lam: R (a, b, lam)."""
    v = jnp.stack([jnp.broadcast_to(l.a, jnp.shape(lam)),
                   jnp.broadcast_to(l.b, jnp.shape(lam)),
                   lam], axis=-1)
    return so3.rotate(l.R, v)


def line_identity(dtype=jnp.float32):
    return Line3(jnp.eye(3, dtype=dtype), jnp.zeros((), dtype=dtype), jnp.zeros((), dtype=dtype))
