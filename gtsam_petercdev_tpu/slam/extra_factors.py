"""Additional SLAM factors from gtsam/slam/.

Covers: FrobeniusFactor/FrobeniusBetweenFactor (FrobeniusFactor.h),
KarcherMeanFactor (KarcherMeanFactor.h), PoseRotationPrior/
PoseTranslationPrior (PoseRotationPrior.h, PoseTranslationPrior.h),
RotateFactor/RotateDirectionsFactor (RotateFactor.h), EssentialMatrixFactor
family (EssentialMatrixFactor.h), EssentialMatrixConstraint
(EssentialMatrixConstraint.h), OrientedPlane3Factor
(OrientedPlane3Factor.h), ReferenceFrameFactor (ReferenceFrameFactor.h),
AntiFactor (AntiFactor.h) and PlanarProjectionFactor
(PlanarProjectionFactor.h). Each is a batched FactorType — residuals are
pure functions vmapped over struct-of-arrays params.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import essential as ess
from gtsam_petercdev_tpu.geometry import pose3, so3, unit3
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


@lru_cache(maxsize=None)
def frobenius_factor() -> FactorType:
    """||R1 - R2||_F as a 9-vector residual (FrobeniusFactor.h:87)."""

    def residual(xs, params):
        R1, R2 = xs
        return (R2 - R1).reshape(-1)

    return FactorType(
        name="FrobeniusFactor", var_types=("Rot3", "Rot3"), resid_dim=9,
        residual=residual,
    )


@lru_cache(maxsize=None)
def frobenius_between_factor() -> FactorType:
    """vec(R1 * R12_measured - R2) (FrobeniusBetweenFactor, FrobeniusFactor.h:121)."""

    def residual(xs, params):
        R1, R2 = xs
        return (R1 @ params - R2).reshape(-1)

    return FactorType(
        name="FrobeniusBetweenFactor", var_types=("Rot3", "Rot3"), resid_dim=9,
        residual=residual,
    )


def karcher_mean_factor(n: int) -> FactorType:
    """Karcher-mean gauge factor: sum of log-maps of n rotations = 0
    (slam/KarcherMeanFactor-inl.h — constrains the mean, removing the
    global rotation gauge in rotation averaging)."""

    def residual(xs, params):
        acc = jnp.zeros(3, dtype=xs[0].dtype)
        for R in xs:
            acc = acc + so3.logmap(R)
        return acc

    return FactorType(
        name=f"KarcherMeanFactor{n}", var_types=("Rot3",) * n, resid_dim=3,
        residual=residual,
    )


@lru_cache(maxsize=None)
def pose_rotation_prior() -> FactorType:
    """Prior on the rotation part of a Pose3 only (PoseRotationPrior.h)."""

    def residual(xs, params):
        (p,) = xs
        return so3.logmap(so3.between(params, p.R))

    return FactorType(
        name="PoseRotationPrior", var_types=("Pose3",), resid_dim=3,
        residual=residual,
    )


@lru_cache(maxsize=None)
def pose_translation_prior() -> FactorType:
    """Prior on the translation part of a Pose3 only (PoseTranslationPrior.h)."""

    def residual(xs, params):
        (p,) = xs
        return p.t - params

    return FactorType(
        name="PoseTranslationPrior", var_types=("Pose3",), resid_dim=3,
        residual=residual,
    )


@lru_cache(maxsize=None)
def rotate_factor() -> FactorType:
    """Unknown rotation R relating two angular-velocity-like measurements:
    r = Log(R^T Exp(p) R Exp(-z)) linearized as p - R z (RotateFactor.h).
    params = {'p': [3] nav-frame, 'z': [3] body-frame}."""

    def residual(xs, params):
        (R,) = xs
        return params["p"] - so3.rotate(R, params["z"])

    return FactorType(
        name="RotateFactor", var_types=("Rot3",), resid_dim=3, residual=residual
    )


@lru_cache(maxsize=None)
def rotate_directions_factor() -> FactorType:
    """Same with directions (RotateDirectionsFactor): 2D Unit3 error."""

    def residual(xs, params):
        (R,) = xs
        pred = so3.rotate(R, unit3.normalize(params["z"]))
        return unit3.local(unit3.normalize(params["p"]), pred)

    return FactorType(
        name="RotateDirectionsFactor", var_types=("Rot3",), resid_dim=2,
        residual=residual,
    )


@lru_cache(maxsize=None)
def essential_matrix_factor() -> FactorType:
    """Epipolar constraint on an EssentialMatrix variable from one calibrated
    point pair (EssentialMatrixFactor.h:45): r = pA^T E pB (algebraic)."""

    def residual(xs, params):
        (E,) = xs
        return ess.epipolar_error(E, params["pA"], params["pB"])[None]

    return FactorType(
        name="EssentialMatrixFactor", var_types=("EssentialMatrix",),
        resid_dim=1, residual=residual,
    )


@lru_cache(maxsize=None)
def essential_matrix_constraint() -> FactorType:
    """Between-pose measurement expressed as an essential matrix
    (EssentialMatrixConstraint.h): 5D error between measured E and
    E(pose1.between(pose2))."""

    def residual(xs, params):
        p1, p2 = xs
        rel = pose3.between(p1, p2)
        pred = ess.essential_from_pose(rel.R, rel.t)
        return ess.essential_local(params, pred)

    return FactorType(
        name="EssentialMatrixConstraint", var_types=("Pose3", "Pose3"),
        resid_dim=5, residual=residual,
    )


@lru_cache(maxsize=None)
def oriented_plane3_factor() -> FactorType:
    """Plane landmark measured from a pose (OrientedPlane3Factor.h):
    r = Local(measured_local_plane, Transform(plane, pose))."""

    def residual(xs, params):
        pose, plane = xs
        pred = ess.plane_transform(plane, pose.R, pose.t)
        return ess.plane_local(params, pred)

    return FactorType(
        name="OrientedPlane3Factor", var_types=("Pose3", "OrientedPlane3"),
        resid_dim=3, residual=residual,
    )


@lru_cache(maxsize=None)
def oriented_plane3_direction_prior() -> FactorType:
    """Prior on a plane's direction+distance (OrientedPlane3DirectionPrior)."""

    def residual(xs, params):
        (plane,) = xs
        return ess.plane_local(params, plane)

    return FactorType(
        name="OrientedPlane3DirectionPrior", var_types=("OrientedPlane3",),
        resid_dim=3, residual=residual,
    )


def reference_frame_factor(point_type: str = "Point3") -> FactorType:
    """Transform relating identical landmarks in two frames
    (ReferenceFrameFactor.h): r = T.transform_from(local) - global.
    Vars (global point, Pose3 transform, local point)."""

    def residual(xs, params):
        g, T, l = xs
        return pose3.transform_from(T, l) - g

    return FactorType(
        name="ReferenceFrameFactor", var_types=(point_type, "Pose3", point_type),
        resid_dim=3, residual=residual,
    )


def anti_factor(base: FactorType) -> FactorType:
    """AntiFactor (slam/AntiFactor.h): subtracts a factor's information.

    Usage: graph.add(anti_factor(ft), keys, params, sqrt_info, sign=-1.0).
    The `sign` flows through LinearBatch into every assembly path (gradient,
    hvp, dense Hessian scatter), so adding the anti-factor with the same
    measurement exactly cancels the original factor's contribution — the
    reference's mechanism for removing factors from an incremental solver
    without rebuilding."""
    return FactorType(
        name=f"Anti{base.name}",
        var_types=base.var_types,
        resid_dim=base.resid_dim,
        residual=base.residual,
        linearize_residual=base.linearize_residual,
    )


@lru_cache(maxsize=None)
def planar_projection_factor() -> FactorType:
    """PlanarProjectionFactor1 (slam/PlanarProjectionFactor.h): robot on the
    SE(2) plane observing known 3D landmarks through a fixed camera.
    Var Pose2; params {'landmark':[3], 'measured':[2], 'cal':[5] fx fy s u0 v0,
    'body_P_cam_R':[3,3], 'body_P_cam_t':[3]}."""

    def residual(xs, params):
        (wTb,) = xs  # Pose2 flat [x, y, theta] per geometry/pose2

        # lift SE(2) -> SE(3): rotation about z, translation in plane
        th = wTb[..., 2]
        c, s = jnp.cos(th), jnp.sin(th)
        dtype = wTb.dtype
        R3 = jnp.zeros((3, 3), dtype=dtype)
        R3 = R3.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
        R3 = R3.at[2, 2].set(1.0)
        t3 = jnp.stack([wTb[..., 0], wTb[..., 1], jnp.zeros_like(th)])
        # world -> body -> camera
        Rc = R3 @ params["body_P_cam_R"]
        tc = t3 + R3 @ params["body_P_cam_t"]
        pc = Rc.T @ (params["landmark"] - tc)
        u = pc[0] / pc[2]
        v = pc[1] / pc[2]
        k = params["cal"]
        uv = jnp.stack([k[0] * u + k[2] * v + k[3], k[1] * v + k[4]])
        return uv - params["measured"]

    return FactorType(
        name="PlanarProjectionFactor", var_types=("Pose2",), resid_dim=2,
        residual=residual,
    )
