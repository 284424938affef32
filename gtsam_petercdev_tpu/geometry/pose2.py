"""SE(2): planar rigid transforms.

Representation: flat array [..., 3] = (x, y, theta). Tangent convention
matches the reference: xi = (vx, vy, w) — translation first
(gtsam/geometry/Pose2.cpp:66-96).

Two charts are provided, mirroring the reference's compile switch
GTSAM_SLOW_BUT_CORRECT_EXPMAP (Pose2.cpp:99-120):
  - retract/local: full exponential map (the "correct" chart)
  - retract_first_order/local_first_order: the reference's DEFAULT chart
    (Retract(v) = Pose2(v), Local(p) = (x, y, theta))
Factor implementations default to the first-order chart for exact cost parity
with reference GTSAM on Pose2 datasets.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM = 3
_EPS2 = 1e-14


def identity(dtype=jnp.float32):
    return jnp.zeros(3, dtype=dtype)


def wrap_angle(theta):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def make(x, y, theta):
    return jnp.stack([x, y, theta], axis=-1)


def rot(p):
    """[...,2,2] rotation matrix of the pose."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(p1, p2):
    c, s = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    x = p1[..., 0] + c * p2[..., 0] - s * p2[..., 1]
    y = p1[..., 1] + s * p2[..., 0] + c * p2[..., 1]
    return make(x, y, wrap_angle(p1[..., 2] + p2[..., 2]))


def inverse(p):
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = -(c * p[..., 0] + s * p[..., 1])
    y = -(-s * p[..., 0] + c * p[..., 1])
    return make(x, y, -p[..., 2])


def between(p1, p2):
    """p1^{-1} p2."""
    c, s = jnp.cos(p1[..., 2]), jnp.sin(p1[..., 2])
    dx = p2[..., 0] - p1[..., 0]
    dy = p2[..., 1] - p1[..., 1]
    return make(
        c * dx + s * dy, -s * dx + c * dy, wrap_angle(p2[..., 2] - p1[..., 2])
    )


def _sinc_coeffs(w):
    """(A, B) = (sin w / w, (1 - cos w) / w), Taylor-safe & autodiff-safe."""
    w2 = w * w
    small = w2 < _EPS2
    wg = jnp.where(small, 1.0, w)
    A_exact = jnp.sin(wg) / wg
    B_exact = (1.0 - jnp.cos(wg)) / wg
    A = jnp.where(small, 1.0 - w2 / 6.0, A_exact)
    B = jnp.where(small, w * 0.5 * (1.0 - w2 / 12.0), B_exact)
    return A, B


def expmap(xi):
    """xi [...,3] = (vx, vy, w) -> Pose2 (full SE(2) exp, Pose2.cpp:66)."""
    vx, vy, w = xi[..., 0], xi[..., 1], xi[..., 2]
    A, B = _sinc_coeffs(w)
    return make(A * vx - B * vy, B * vx + A * vy, wrap_angle(w))


def logmap(p):
    """Pose2 -> xi [...,3] (Pose2.cpp:83)."""
    x, y, w = p[..., 0], p[..., 1], p[..., 2]
    A, B = _sinc_coeffs(w)
    # V^{-1} = 1/(A^2+B'^2) [[A, B'],[-B', A]] with B' = (1-cos w)/w
    det = A * A + B * B
    det = jnp.where(det < 1e-12, 1.0, det)
    vx = (A * x + B * y) / det
    vy = (-B * x + A * y) / det
    return make(vx, vy, w)


def retract(p, xi):
    return compose(p, expmap(xi))


def local(p1, p2):
    return logmap(between(p1, p2))


def retract_first_order(p, xi):
    """Reference default chart: compose(p, Pose2(xi)) (Pose2.cpp:99-108)."""
    return compose(p, xi)


def local_first_order(p1, p2):
    """Reference default chart: coordinates of between(p1, p2)."""
    return between(p1, p2)


def adjoint_map(p):
    """[[R, J t],[0, 1]] with J = [[0,1],[-1,0]]; Ad for xi=(v,w) order."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x, y = p[..., 0], p[..., 1]
    z = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, y], axis=-1),
            jnp.stack([s, c, -x], axis=-1),
            jnp.stack([z, z, one], axis=-1),
        ],
        axis=-2,
    )


def transform_from(p, point):
    """Pose frame -> world: R q + t. point [...,2]."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    qx, qy = point[..., 0], point[..., 1]
    return jnp.stack(
        [p[..., 0] + c * qx - s * qy, p[..., 1] + s * qx + c * qy], axis=-1
    )


def transform_to(p, point):
    """World -> pose frame: R^T (q - t)."""
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    dx = point[..., 0] - p[..., 0]
    dy = point[..., 1] - p[..., 1]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def bearing(p, point):
    """Bearing angle to a world point, in the pose frame (Rot2 as angle)."""
    d = transform_to(p, point)
    return jnp.arctan2(d[..., 1], d[..., 0])


def range_to(p, point):
    d = transform_to(p, point)
    return jnp.linalg.norm(d, axis=-1)
