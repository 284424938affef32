"""Geometry breadth: SphericalCamera, FundamentalMatrix, Similarity2, SO(n).

References:
  gtsam/geometry/SphericalCamera.h:36 — camera with Unit3 bearing
  measurements (project returns a unit bearing; error lives in the
  bearing's 2D tangent basis).
  gtsam/geometry/FundamentalMatrix.{h,cpp} — rank-2 F = U diag(1, s, 0) V^T
  on the manifold SO(3) x R x SO(3) (dim 7), plus SimpleFundamentalMatrix
  from calibrations + essential matrix.
  gtsam/geometry/Similarity2.h — 2D similarity (R, t, s), dim 4.
  gtsam/geometry/SOn.h / SO4.h — SO(n) with vec/expmap; here expmap via
  jax.scipy.linalg.expm and logmap via inverse scaling-and-squaring
  (Denman-Beavers square roots + Taylor log), all jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose3, rot2, so3, unit3


# --- SphericalCamera --------------------------------------------------------


def spherical_project(pose: "pose3.Pose3", point):
    """World point -> unit bearing in the camera frame
    (SphericalCamera::project2)."""
    q = pose3.transform_to(pose, point)
    n = jnp.linalg.norm(q)
    return q / jnp.where(n < 1e-12, 1.0, n)


def spherical_reprojection_error(pose: "pose3.Pose3", point, measured_bearing):
    """2D error in the measured bearing's tangent basis
    (SphericalCamera::reprojectionError -> Unit3::errorVector)."""
    p = spherical_project(pose, point)
    return unit3.local(measured_bearing, p)


def spherical_backproject(pose: "pose3.Pose3", bearing, depth):
    return pose3.transform_from(pose, bearing * depth)


# --- FundamentalMatrix ------------------------------------------------------


def fundamental_from_essential(K1, E, K2):
    """F = K2^-T E K1^-1 (FundamentalMatrix(K1, E, K2) ctor)."""
    return jnp.linalg.solve(K2.T, E) @ jnp.linalg.inv(K1)


def fundamental_params(F):
    """Decompose a rank-2 F into (U in SO3, s, V in SO3) with
    F ~ U diag(1, s, 0) V^T (FundamentalMatrix.cpp initialize)."""
    Uf, S, Vt = jnp.linalg.svd(F)
    # fix determinants into SO(3) (reference flips sign of a column)
    du = jnp.linalg.det(Uf)
    dv = jnp.linalg.det(Vt)
    U = Uf * jnp.asarray([1.0, 1.0, 0.0])[None, :] + (
        Uf * jnp.asarray([0.0, 0.0, 1.0])[None, :] * du
    )
    V = Vt.T * jnp.asarray([1.0, 1.0, 0.0])[None, :] + (
        Vt.T * jnp.asarray([0.0, 0.0, 1.0])[None, :] * dv
    )
    s = S[1] / S[0]
    return U, s, V


def fundamental_matrix(U, s, V):
    """F = U diag(1, s, 0) V^T."""
    d = jnp.stack([jnp.ones_like(s), s, jnp.zeros_like(s)])
    return (U * d[None, :]) @ V.T


def fundamental_retract(U, s, V, xi):
    """Manifold retract on SO(3) x R x SO(3): xi = [wU (3), ds, wV (3)]."""
    return (
        U @ so3.expmap(xi[:3]),
        s + xi[3],
        V @ so3.expmap(xi[4:7]),
    )


def epipolar_error(F, p1, p2):
    """Sampson-free algebraic epipolar error p2^T F p1 with homogeneous
    pixel points [u, v] (FundamentalMatrix tests' error convention)."""
    h1 = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    h2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    return jnp.einsum("...i,ij,...j->...", h2, F, h1)


# --- Similarity2 ------------------------------------------------------------


def sim2(theta, t, s, dtype=jnp.float64):
    """Similarity2 as (R [2,2], t [2], s scalar) — Similarity2.h:40."""
    return (
        rot2.matrix(jnp.asarray(theta, dtype=dtype)),
        jnp.asarray(t, dtype=dtype),
        jnp.asarray(s, dtype=dtype),
    )


def sim2_transform_from(g, p):
    R, t, s = g
    return s * (R @ p) + t


def sim2_compose(a, b):
    Ra, ta, sa = a
    Rb, tb, sb = b
    return (Ra @ Rb, sa * (Ra @ tb) + ta, sa * sb)


def sim2_inverse(g):
    R, t, s = g
    Rt = R.T
    return (Rt, -(Rt @ t) / s, 1.0 / s)


def sim2_identity(dtype=jnp.float64):
    return (jnp.eye(2, dtype=dtype), jnp.zeros(2, dtype=dtype),
            jnp.asarray(1.0, dtype=dtype))


# --- SO(n) ------------------------------------------------------------------


def son_dim(n: int) -> int:
    return n * (n - 1) // 2


def _son_sign_index(n: int):
    """(row, col, sign, vec-slot) quadruples of gtsam SOn::Hat's recursion
    (SOn.cpp:25-49): level m fills row/col m-1 from xi[D - m(m-1)/2 ...],
    starting with sign (-1)^(m(m-1)/2) and alternating along the row."""
    D = n * (n - 1) // 2
    out = []
    for m in range(n, 1, -1):
        off = D - m * (m - 1) // 2
        sign = (-1.0) ** (m * (m - 1) // 2)
        for i in range(m - 1):
            j = m - 2 - i
            out.append((m - 1, j, sign, off + i))
            sign = -sign
    return out


def son_hat(xi, n: int):
    """vec -> skew; matches gtsam SOn::Hat exactly (SOn.cpp:25, verified
    against the hard-coded matrices of testSOn.cpp HatVee for n=2..5)."""
    X = jnp.zeros((n, n), dtype=xi.dtype)
    for (r, c, sign, k) in _son_sign_index(n):
        X = X.at[r, c].set(-sign * xi[k])
        X = X.at[c, r].set(sign * xi[k])
    return X


def son_vee(X, n: int):
    out = [None] * (n * (n - 1) // 2)
    for (r, c, sign, k) in _son_sign_index(n):
        out[k] = -sign * X[r, c]
    return jnp.stack(out)


def son_expmap(xi, n: int):
    return jax.scipy.linalg.expm(son_hat(xi, n))


def _logm_rot(R, sqrt_iters: int = 8, taylor_terms: int = 12):
    """Matrix log of a rotation by inverse scaling-and-squaring:
    repeated principal square roots (Denman-Beavers) then Taylor log."""
    Y = R
    for _ in range(sqrt_iters):
        # Denman-Beavers iteration for the principal square root
        M = Y
        Z = jnp.eye(Y.shape[-1], dtype=Y.dtype)
        for _ in range(12):
            Mn = 0.5 * (M + jnp.linalg.inv(Z))
            Z = 0.5 * (Z + jnp.linalg.inv(M))
            M = Mn
        Y = M
    A = Y - jnp.eye(Y.shape[-1], dtype=Y.dtype)
    out = jnp.zeros_like(Y)
    term = A
    for k in range(1, taylor_terms + 1):
        out = out + ((-1.0) ** (k + 1)) / k * term
        term = term @ A
    return out * (2.0 ** sqrt_iters)


def son_logmap(R, n: int):
    X = _logm_rot(R)
    X = 0.5 * (X - X.T)  # project to skew
    return son_vee(X, n)


def son_retract(R, xi, n: int):
    return R @ son_expmap(xi, n)


def son_local(R1, R2, n: int):
    return son_logmap(R1.T @ R2, n)
