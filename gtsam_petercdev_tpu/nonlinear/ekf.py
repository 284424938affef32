"""Extended Kalman filter over manifolds.

Reference: gtsam/nonlinear/ExtendedKalmanFilter-inl.h — predict/update via
one-step factor-graph elimination on the linearized motion/measurement
models. Here: Jacobians come from jax.jacfwd of the user's motion and
measurement functions THROUGH the manifold chart (retract), so the filter
works for any registered manifold type (Pose2/Pose3/NavState/...), and the
covariance lives in the tangent space at the current estimate.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import kalman


class ManifoldBelief(NamedTuple):
    value: Any  # manifold point (pytree)
    cov: jnp.ndarray  # [d, d] tangent covariance at `value`


def predict(
    belief: ManifoldBelief,
    type_name: str,
    motion: Callable[[Any], Any],  # x -> x' (on the manifold)
    Q: jnp.ndarray,  # [d, d] process noise in the tangent at x'
) -> ManifoldBelief:
    m = manifold.get(type_name)
    x_new = motion(belief.value)

    def chart(xi):
        # tangent at x mapped through motion into tangent at x_new
        return m.local(x_new, motion(m.retract(belief.value, xi)))

    d = m.dim
    F = jax.jacfwd(chart)(jnp.zeros((d,), dtype=belief.cov.dtype))
    P = F @ belief.cov @ F.T + Q
    return ManifoldBelief(x_new, P)


def update(
    belief: ManifoldBelief,
    type_name: str,
    h: Callable[[Any], jnp.ndarray],  # measurement model
    z: jnp.ndarray,
    R: jnp.ndarray,
) -> ManifoldBelief:
    m = manifold.get(type_name)
    d = m.dim

    def h_chart(xi):
        return h(m.retract(belief.value, xi))

    z0 = jnp.zeros((d,), dtype=belief.cov.dtype)
    H = jax.jacfwd(h_chart)(z0)
    y = jnp.asarray(z) - h(belief.value)
    S = H @ belief.cov @ H.T + jnp.asarray(R)
    K = jnp.linalg.solve(S.T, (belief.cov @ H.T).T).T
    xi = K @ y
    x_new = m.retract(belief.value, xi)
    I = jnp.eye(d, dtype=belief.cov.dtype)
    A = I - K @ H
    P = A @ belief.cov @ A.T + K @ jnp.asarray(R) @ K.T
    return ManifoldBelief(x_new, P)
