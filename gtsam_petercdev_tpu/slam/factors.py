"""Core SLAM factor types: Prior and Between over any registered Lie group.

Reference semantics:
  PriorFactor<T>::evaluateError(x)  = -Local(x, prior), Jacobian = Identity
    (gtsam/nonlinear/PriorFactor.h:98-102)
  BetweenFactor<T>::evaluateError   = Local(measured, between(x1, x2)) with
    Jacobians of `between` alone — the default build OMITS the Local
    chain-rule term (gtsam/slam/BetweenFactor.h:111-124,
    GTSAM_SLOW_BUT_CORRECT_BETWEENFACTOR off).

Both conventions are the classical "manifold GN on h(x) ⊖ z" formulation:
Jacobians are taken in h(x)'s own tangent chart at the linearization point.
They are reproduced here exactly (via FactorType.linearize_residual) so that
converged solutions match the reference bit-for-bit in structure; set
gtsam_compatible=False for fully-consistent autodiff Jacobians of the cost.

`Local` is each type's canonical chart as registered in core.manifold —
first-order for Pose2, expmap for Pose3/Rot3, matching the reference's
default build flags (Pose2.cpp:99-120; GTSAM_POSE3_EXPMAP ON).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


def nonlinear_equality(type_name: str):
    """NonlinearEquality<T> (gtsam/nonlinear/NonlinearEquality.h:44): pin a
    variable EXACTLY to a value. Returns (factor_type, sqrt_info, mask) —
    add with graph.add(ft, [key], value, sqrt_info, constrained_mask=mask)
    and solve with the exact constrained path (solver="dense")."""
    import numpy as np

    from gtsam_petercdev_tpu.linear.noise import constrained_all

    m = manifold.get(type_name)
    sqrt_info, mask = constrained_all(m.dim)
    return prior_factor(type_name), sqrt_info, mask


def _pose3_prior_analytic(m):
    def analytic(xs, params):
        (x,) = xs
        r0 = -m.local(x, params)
        J = jnp.eye(m.dim, dtype=r0.dtype)
        return r0, (J,)

    return analytic


def _pose3_between_analytic(m):
    from gtsam_petercdev_tpu.geometry import pose3

    def analytic(xs, params):
        x1, x2 = xs
        h0 = m.between(x1, x2)
        r0 = m.local(params, h0)
        # between(x1 Exp(d1), x2 Exp(d2)) = h0 Exp(-Ad(h0^-1) d1) Exp(d2)
        # => J1 = -Ad(h0^-1), J2 = I in h0's chart (the reference's
        # hand-derived H1/H2, gtsam/geometry/Pose3.cpp compose/between)
        J1 = -pose3.adjoint_map(pose3.inverse(h0))
        J2 = jnp.eye(m.dim, dtype=r0.dtype)
        return r0, (J1, J2)

    return analytic


@lru_cache(maxsize=None)
def prior_factor(type_name: str, gtsam_compatible: bool = True) -> FactorType:
    """Unary prior; params = prior value."""
    m = manifold.get(type_name)

    def residual(xs, params):
        (x,) = xs
        return -m.local(x, params)

    def linearize_residual(xs_r, xs0, params):
        # value at delta=0: -Local(x0, prior); Jacobian: d/ddelta
        # Local(x0, x0 ⊞ delta) = Identity (PriorFactor.h:99).
        (x,) = xs_r
        (x0,) = xs0
        return -m.local(x0, params) + m.local(x0, x)

    return FactorType(
        name=f"Prior{type_name}",
        var_types=(type_name,),
        resid_dim=m.dim,
        residual=residual,
        linearize_residual=linearize_residual if gtsam_compatible else None,
        analytic=_pose3_prior_analytic(m)
        if (gtsam_compatible and type_name == "Pose3")
        else None,
    )


@lru_cache(maxsize=None)
def between_factor(type_name: str, gtsam_compatible: bool = True) -> FactorType:
    """Binary relative measurement; params = measured value."""
    m = manifold.get(type_name)

    def residual(xs, params):
        x1, x2 = xs
        return m.local(params, m.between(x1, x2))

    def linearize_residual(xs_r, xs0, params):
        # value at delta=0: Local(measured, h0); Jacobian: derivative of
        # between() in the chart at h0 — no Local chain term
        # (BetweenFactor.h:122, default build).
        x1, x2 = xs_r
        h0 = m.between(xs0[0], xs0[1])
        return m.local(params, h0) + m.local(h0, m.between(x1, x2))

    return FactorType(
        name=f"Between{type_name}",
        var_types=(type_name, type_name),
        resid_dim=m.dim,
        residual=residual,
        linearize_residual=linearize_residual if gtsam_compatible else None,
        analytic=_pose3_between_analytic(m)
        if (gtsam_compatible and type_name == "Pose3")
        else None,
    )
