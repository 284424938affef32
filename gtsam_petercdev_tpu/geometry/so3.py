"""SO(3): rotation matrices with exp/log maps and derivatives.

Representation: rotation matrix, array shape [..., 3, 3]. Tangent: axis-angle
vector omega [..., 3]. All functions are pure, batched over leading dims, and
differentiable everywhere (Taylor-series fallbacks are selected with
NaN-safe `where` guards so jax.jacfwd/jacrev are exact at the singular points).

Mirrors the reference API surface of gtsam/geometry/SO3.h:68-183
(Expmap/Logmap/ExpmapDerivative/LogmapDerivative/Hat/Vee) — re-derived, not
translated.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS2 = 1e-10  # theta^2 threshold below which Taylor expansions are used


def hat(w):
    """omega [...,3] -> skew-symmetric matrix [...,3,3] (SO3::Hat)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: [...,3,3] -> [...,3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _trig_coeffs(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (1 - A)/t^2), Taylor-safe.

    These drive Rodrigues and both exp-map Jacobians.
    """
    small = theta2 < _EPS2
    # Guard: evaluate exact branch at a safe value where `small` to keep
    # gradients NaN-free (standard safe-where pattern).
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    A_exact = jnp.sin(t) / t
    B_exact = (1.0 - jnp.cos(t)) / t2
    C_exact = (1.0 - A_exact) / t2
    A_taylor = 1.0 - theta2 / 6.0 * (1.0 - theta2 / 20.0)
    B_taylor = 0.5 - theta2 / 24.0 * (1.0 - theta2 / 30.0)
    C_taylor = 1.0 / 6.0 - theta2 / 120.0 * (1.0 - theta2 / 42.0)
    A = jnp.where(small, A_taylor, A_exact)
    B = jnp.where(small, B_taylor, B_exact)
    C = jnp.where(small, C_taylor, C_exact)
    return A, B, C


def expmap(w):
    """Exponential map: omega [...,3] -> R [...,3,3] (Rodrigues).

    Reference semantics: SO3::Expmap (gtsam/geometry/SO3.h:68).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _trig_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def logmap(R):
    """Log map: R [...,3,3] -> omega [...,3].

    Handles the three regimes of gtsam SO3::Logmap (small angle, generic,
    near pi) branchlessly with safe selects.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    w_vee = vee(R - jnp.swapaxes(R, -1, -2))  # = 2 sin(theta) * axis

    # |sin(theta)| via a gradient-safe norm. `tiny` guards the sqrt's
    # derivative blow-up at exactly 0 — threshold scales with dtype eps so it
    # only fires where sin(theta) is numerically zero.
    s2 = jnp.sum(w_vee * w_vee, axis=-1)  # = 4 sin^2(theta)
    tiny = s2 < (100.0 * jnp.finfo(R.dtype).eps) ** 2
    sin_t = 0.5 * jnp.sqrt(jnp.where(tiny, 1.0, s2))
    sin_safe = jnp.where(tiny, 0.0, sin_t)
    # theta from atan2 — differentiable everywhere we use the exact branch
    # (arccos is NOT: its derivative blows up at |cos|=1).
    theta = jnp.arctan2(sin_safe, cos_t)

    near_pi = cos_t < -1.0 + 1e-6
    small = jnp.logical_and(s2 < 4.0 * _EPS2, cos_t > 0.0)
    theta2 = s2 / 4.0  # ~ theta^2 in the small regime

    # Generic / small-angle branch: omega = theta/(2 sin theta) * vee
    gen_scale_exact = theta / jnp.where(small, 1.0, 2.0 * jnp.where(tiny, 1.0, sin_t))
    gen_scale_taylor = 0.5 + theta2 / 12.0 + 7.0 * theta2 * theta2 / 720.0
    gen_scale = jnp.where(small, gen_scale_taylor, gen_scale_exact)
    w_gen = gen_scale[..., None] * w_vee

    # Near-pi branch. R = cos(t) I + sin(t) hat(a) + (1-cos(t)) a a^T, so the
    # symmetric part gives a a^T = ((R+R^T)/2 - cos(t) I) / (1-cos(t)) — well
    # conditioned near pi (denominator ~ 2). The angle comes from
    # t = pi - arcsin(|sin t|), which is well conditioned near pi where
    # arccos is not.
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_safe, 0.0, 1.0))
    one_minus_cos = jnp.where(near_pi, 1.0 - cos_t, 1.0)[..., None, None]
    M = (
        0.5 * (R + jnp.swapaxes(R, -1, -2))
        - cos_t[..., None, None] * jnp.eye(3, dtype=R.dtype)
    ) / one_minus_cos
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(M, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    col_norm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis = col / jnp.where(col_norm < 1e-12, 1.0, col_norm)
    # Fix the sign of the axis using the skew part (zero exactly at pi, where
    # both signs are valid).
    sign = jnp.sign(jnp.sum(axis * w_vee, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    w_pi = theta_pi[..., None] * axis * sign

    return jnp.where(near_pi[..., None], w_pi, w_gen)


def expmap_derivative(w):
    """Right Jacobian Jr of the exponential map (SO3::ExpmapDerivative).

    d/dw Expmap(w) in the sense Exp(w + dw) ~ Exp(w) Exp(Jr dw).
    Jr = I - B*W + C*W^2 with W = hat(w).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _trig_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - B[..., None, None] * W + C[..., None, None] * W2


def logmap_derivative(w):
    """Inverse right Jacobian Jr^{-1} (SO3::LogmapDerivative).

    Jr^{-1} = I + W/2 + D*W^2, D = 1/t^2 - (1+cos t)/(2 t sin t).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _EPS2
    t2 = jnp.where(small, 1.0, theta2)
    t = jnp.sqrt(t2)
    D_exact = 1.0 / t2 - (1.0 + jnp.cos(t)) / (2.0 * t * jnp.sin(t))
    D_taylor = 1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0
    D = jnp.where(small, D_taylor, D_exact)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + 0.5 * W + D[..., None, None] * W2


def left_jacobian(w):
    """Left Jacobian Jl(w) = Jr(-w) — used by SE(3) Expmap translation."""
    return expmap_derivative(-w)


def left_jacobian_inverse(w):
    return logmap_derivative(-w)


def compose(R1, R2):
    return R1 @ R2


def inverse(R):
    return jnp.swapaxes(R, -1, -2)


def between(R1, R2):
    """R1^{-1} R2."""
    return inverse(R1) @ R2


def rotate(R, p):
    """Apply rotation to points: [...,3,3] x [...,3] -> [...,3]."""
    return jnp.einsum("...ij,...j->...i", R, p)


def unrotate(R, p):
    return jnp.einsum("...ji,...j->...i", R, p)


def identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype)


def retract(R, w):
    """Expmap-based retract (gtsam default chart for Rot3)."""
    return R @ expmap(w)


def local(R1, R2):
    """Tangent of R2 in the chart at R1: Log(R1^{-1} R2)."""
    return logmap(between(R1, R2))


def rpy(R):
    """Roll-pitch-yaw (xyz) extraction — for reporting only."""
    return jnp.stack(
        [
            jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
            -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0)),
            jnp.arctan2(R[..., 1, 0], R[..., 0, 0]),
        ],
        axis=-1,
    )


def from_quaternion(q):
    """Quaternion [...,4] (w,x,y,z) -> rotation matrix (for g2o I/O)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def to_quaternion(R):
    """Rotation matrix -> quaternion [...,4] (w,x,y,z), Shepperd's method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Four candidate formulations; pick the best-conditioned one.
    q0 = jnp.stack(
        [safe_sqrt(1 + tr) / 2, (m21 - m12) / (2 * safe_sqrt(1 + tr)),
         (m02 - m20) / (2 * safe_sqrt(1 + tr)), (m10 - m01) / (2 * safe_sqrt(1 + tr))],
        axis=-1,
    )
    s1 = 2 * safe_sqrt(1 + m00 - m11 - m22)
    q1 = jnp.stack([(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = 2 * safe_sqrt(1 - m00 + m11 - m22)
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2], axis=-1)
    s3 = 2 * safe_sqrt(1 - m00 - m11 + m22)
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4], axis=-1)

    cand = jnp.stack([tr, m00, m11, m22], axis=-1)
    k = jnp.argmax(cand, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, k[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
