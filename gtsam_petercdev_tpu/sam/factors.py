"""sam factors: bearing / range / bearing-range measurements.

Reference: gtsam/sam/{BearingFactor,RangeFactor,BearingRangeFactor}.h —
ExpressionFactor-based in the reference; here plain FactorTypes whose
Jacobians come from the framework's vmap(jacfwd) path (JAX autodiff subsumes
the reference's Expression reverse-AD, SURVEY §7.1).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import pose2, pose3, unit3
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


def _wrap(theta):
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


@lru_cache(maxsize=None)
def range_factor(pose_type: str = "Pose2", point_type: str = "Point2") -> FactorType:
    """||translation(pose) - point|| - measured (RangeFactor.h)."""

    if pose_type == "Pose2":
        def trans(x):
            return x[..., :2]
    else:
        def trans(x):
            return x.t

    def residual(xs, params):
        x, p = xs
        d = jnp.linalg.norm(trans(x) - p) - params
        return d[None] if jnp.ndim(d) == 0 else d

    return FactorType(
        name=f"Range{pose_type}{point_type}",
        var_types=(pose_type, point_type),
        resid_dim=1,
        residual=residual,
    )


@lru_cache(maxsize=None)
def bearing_factor_2d() -> FactorType:
    """Pose2 -> Point2 bearing (BearingFactor.h, BearingRange2D):
    residual = wrap(atan2 of the point in the body frame - measured)."""

    def residual(xs, params):
        x, p = xs
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        dx, dy = p[0] - x[0], p[1] - x[1]
        local_x = c * dx + s * dy
        local_y = -s * dx + c * dy
        return _wrap(jnp.arctan2(local_y, local_x) - params)[None]

    return FactorType(
        name="BearingPose2Point2",
        var_types=("Pose2", "Point2"),
        resid_dim=1,
        residual=residual,
    )


@lru_cache(maxsize=None)
def bearing_range_factor_2d() -> FactorType:
    """[bearing; range] stacked (BearingRangeFactor.h)."""

    def residual(xs, params):
        x, p = xs
        c, s = jnp.cos(x[2]), jnp.sin(x[2])
        dx, dy = p[0] - x[0], p[1] - x[1]
        local_x = c * dx + s * dy
        local_y = -s * dx + c * dy
        b = _wrap(jnp.arctan2(local_y, local_x) - params[0])
        r = jnp.sqrt(dx * dx + dy * dy) - params[1]
        return jnp.stack([b, r])

    return FactorType(
        name="BearingRangePose2Point2",
        var_types=("Pose2", "Point2"),
        resid_dim=2,
        residual=residual,
    )


@lru_cache(maxsize=None)
def bearing_factor_3d() -> FactorType:
    """Pose3 -> Point3 bearing as a Unit3 2D residual (BearingRange3D):
    residual = Unit3::localCoordinates(measured, observed_direction)."""

    def residual(xs, params):
        x, p = xs
        d = pose3.transform_to(x, p)
        obs = unit3.normalize(d)
        return unit3.local(params, obs)

    return FactorType(
        name="BearingPose3Point3",
        var_types=("Pose3", "Point3"),
        resid_dim=2,
        residual=residual,
    )
