"""Research-grade factors from gtsam_unstable/slam.

  * ProjectionFactorRollingShutter (ProjectionFactorRollingShutter.h:43):
    the landmark is projected through the pose INTERPOLATED between two
    consecutive keyframes at the pixel row's exposure time
    alpha = (t_p - t_A)/(t_B - t_A).
  * BetweenFactorEM (BetweenFactorEM.h:34): per-factor EM data association —
    the whitened residual is the inlier/outlier responsibility-weighted
    stack, responsibilities computed from the current estimate and held
    constant through linearization (stop_gradient = the EM E-step).
  * InvDepthFactor3 (InvDepthFactor3.h, InvDepthCamera3.h:75): visual
    measurement of a landmark parameterized as an anchor ray
    (x, y, z, theta, phi) plus a separate inverse depth variable.

Jacobians come from JAX autodiff (the reference hand-derives them; the
jacfwd oracle tests check residual semantics against the reference's
formulas instead).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import cameras, pose3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType

# anchor-ray part of the split inverse-depth landmark (InvDepthFactor3.h:10:
# "(x,y,z,theta,phi), (inv_depth) to make it easy to add a prior on inverse
# depth alone")
manifold.register(manifold.vector_space("InvDepthRay5", 5))


def interpolate_pose3(a: Pose3, b: Pose3, alpha) -> Pose3:
    """gtsam::interpolate<Pose3>: a * Expmap(alpha * Logmap(a^-1 b))."""
    xi = pose3.logmap(pose3.between(a, b))
    return pose3.compose(a, pose3.expmap(alpha * xi))


@lru_cache(maxsize=None)
def projection_factor_rolling_shutter() -> FactorType:
    """Vars: (Pose3 A, Pose3 B, Point3); params: {'uv':[2], 'K':[5],
    'alpha':[]} (ProjectionFactorRollingShutter.h:43)."""

    def residual(xs, params):
        pa, pb, point = xs
        pose = interpolate_pose3(pa, pb, params["alpha"])
        uv, depth = cameras.project_s2(pose, point, params["K"])
        r = uv - params["uv"]
        return jnp.where(depth > 0, r, jnp.zeros_like(r))

    return FactorType(
        name="ProjectionFactorRollingShutter",
        var_types=("Pose3", "Pose3", "Point3"),
        resid_dim=2,
        residual=residual,
    )


@lru_cache(maxsize=None)
def between_factor_em(type_name: str) -> FactorType:
    """EM inlier/outlier between factor (BetweenFactorEM.h:34).

    Params: {'measured': value, 'R_in'/'R_out': [d, d] whitening factors of
    the two hypothesis noise models, 'prior_in'/'prior_out': scalars}.
    Residual (dim 2d) = [sqrt(p_in) R_in r ; sqrt(p_out) R_out r] with
    responsibilities p ~ prior * |R| exp(-0.5 |R r|^2), normalized, and
    stop_gradient'ed (BetweenFactorEM.h:147-246). Use a UNIT outer noise
    model — the factor whitens internally."""
    m = manifold.get(type_name)

    def residual(xs, params):
        x1, x2 = xs
        r = m.local(params["measured"], m.between(x1, x2))
        r_in = params["R_in"] @ r
        r_out = params["R_out"] @ r
        p_in = (
            params["prior_in"]
            * jnp.abs(jnp.linalg.det(params["R_in"]))
            * jnp.exp(-0.5 * jnp.dot(r_in, r_in))
        )
        p_out = (
            params["prior_out"]
            * jnp.abs(jnp.linalg.det(params["R_out"]))
            * jnp.exp(-0.5 * jnp.dot(r_out, r_out))
        )
        s = p_in + p_out
        w_in = jax.lax.stop_gradient(jnp.sqrt(p_in / s))
        w_out = jax.lax.stop_gradient(jnp.sqrt(p_out / s))
        return jnp.concatenate([w_in * r_in, w_out * r_out])

    return FactorType(
        name=f"BetweenFactorEM{type_name}",
        var_types=(type_name, type_name),
        resid_dim=2 * m.dim,
        residual=residual,
    )


def inv_depth_to_point(ray5, rho):
    """InvDepthCamera3::invDepthTo3D (InvDepthCamera3.h:75): world point =
    base + unit(theta, phi) / rho."""
    x, y, z, theta, phi = (
        ray5[..., 0], ray5[..., 1], ray5[..., 2], ray5[..., 3], ray5[..., 4]
    )
    mvec = jnp.stack(
        [
            jnp.cos(theta) * jnp.cos(phi),
            jnp.sin(theta) * jnp.cos(phi),
            jnp.sin(phi),
        ],
        axis=-1,
    )
    base = jnp.stack([x, y, z], axis=-1)
    return base + mvec / rho[..., None]


def inv_depth_backproject(pose: Pose3, K, uv, depth):
    """InvDepthCamera3::backproject: pixel + depth -> (ray5, inv depth)."""
    pt = cameras.backproject_s2(pose, K, uv, jnp.asarray(depth))
    ray = pt - pose.t
    theta = jnp.arctan2(ray[..., 1], ray[..., 0])
    phi = jnp.arctan2(
        ray[..., 2], jnp.linalg.norm(ray[..., :2], axis=-1)
    )
    ray5 = jnp.concatenate(
        [pose.t, theta[..., None], phi[..., None]], axis=-1
    )
    return ray5, 1.0 / jnp.linalg.norm(ray, axis=-1)


@lru_cache(maxsize=None)
def inv_depth_factor3() -> FactorType:
    """Vars: (Pose3, InvDepthRay5, Vector1); params: {'uv':[2], 'K':[5]}
    (InvDepthFactor3.h:88)."""

    def residual(xs, params):
        pose, ray5, rho = xs
        point = inv_depth_to_point(ray5, rho[..., 0])
        uv, depth = cameras.project_s2(pose, point, params["K"])
        r = uv - params["uv"]
        return jnp.where(depth > 0, r, jnp.zeros_like(r))

    return FactorType(
        name="InvDepthFactor3",
        var_types=("Pose3", "InvDepthRay5", "Vector1"),
        resid_dim=2,
        residual=residual,
    )
