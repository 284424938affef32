"""Navigation factors: ImuFactor, CombinedImuFactor, GPS, velocity priors.

Reference semantics:
  ImuFactor (navigation/ImuFactor.h:170): 5-way (Xi, Vi, Xj, Vj, B);
    whitened by the 9x9 preintegration covariance.
  CombinedImuFactor (CombinedImuFactor.h:209): 6-way (Xi, Vi, Xj, Vj, Bi, Bj);
    15-dim error appending the bias random-walk residual b_j - b_i; whitened
    by a 15x15 covariance.
  GPSFactor (navigation/GPSFactor.h): position-only prior on Pose3.

PIM fields ride as factor params (a stacked pytree per batch), so a batch of
IMU factors linearizes as one vmapped jacfwd — no per-factor dispatch.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

import gtsam_petercdev_tpu.navigation.navstate  # registers NavState/ConstantBias
from gtsam_petercdev_tpu.navigation.navstate import NavState
from gtsam_petercdev_tpu.navigation import preintegration as pre
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


@lru_cache(maxsize=None)
def imu_factor() -> FactorType:
    """Vars (Pose3, Vector3, Pose3, Vector3, ConstantBias); params
    {'pim': PIM, 'n_gravity': [3]}."""

    def residual(xs, params):
        pose_i, vel_i, pose_j, vel_j, bias = xs
        pim = params["pim"]
        p = pre.PreintegrationParams(
            accel_cov=None, gyro_cov=None, integration_cov=None,
            n_gravity=params["n_gravity"],
        )
        return pre.compute_error(
            pim, p, NavState(pose_i.R, pose_i.t, vel_i),
            NavState(pose_j.R, pose_j.t, vel_j), bias,
        )

    return FactorType(
        name="ImuFactor",
        var_types=("Pose3", "Vector3", "Pose3", "Vector3", "ConstantBias"),
        resid_dim=9,
        residual=residual,
    )


@lru_cache(maxsize=None)
def combined_imu_factor() -> FactorType:
    """Vars (..., ConstantBias_i, ConstantBias_j); 15-dim residual."""

    def residual(xs, params):
        pose_i, vel_i, pose_j, vel_j, bias_i, bias_j = xs
        pim = params["pim"]
        p = pre.PreintegrationParams(
            accel_cov=None, gyro_cov=None, integration_cov=None,
            n_gravity=params["n_gravity"],
        )
        e_imu = pre.compute_error(
            pim, p, NavState(pose_i.R, pose_i.t, vel_i),
            NavState(pose_j.R, pose_j.t, vel_j), bias_i,
        )
        e_bias = bias_j - bias_i
        return jnp.concatenate([e_imu, e_bias], axis=-1)

    return FactorType(
        name="CombinedImuFactor",
        var_types=("Pose3", "Vector3", "Pose3", "Vector3", "ConstantBias", "ConstantBias"),
        resid_dim=15,
        residual=residual,
    )


def combined_covariance(pim: pre.PIM, params: pre.PreintegrationParams):
    """15x15 whitening covariance for CombinedImuFactor: preintegration block
    + bias random walk over deltaT + initial bias uncertainty coupling
    (simplified block-diagonal form of CombinedImuFactor.h's propagation —
    the bias blocks are the random-walk accumulation)."""
    dtype = pim.cov.dtype
    cov = jnp.zeros((15, 15), dtype=dtype)
    cov = cov.at[:9, :9].set(pim.cov)
    walk = jnp.zeros((6, 6), dtype=dtype)
    walk = walk.at[:3, :3].set(params.bias_acc_cov * pim.deltaT)
    walk = walk.at[3:, 3:].set(params.bias_omega_cov * pim.deltaT)
    cov = cov.at[9:, 9:].set(walk + params.bias_acc_omega_init)
    return cov


@lru_cache(maxsize=None)
def gps_factor() -> FactorType:
    """GPSFactor: r = t(pose) - measured (navigation/GPSFactor.h)."""

    def residual(xs, params):
        (pose,) = xs
        return pose.t - params

    return FactorType(
        name="GPSFactor", var_types=("Pose3",), resid_dim=3, residual=residual
    )


@lru_cache(maxsize=None)
def velocity_prior() -> FactorType:
    def residual(xs, params):
        (v,) = xs
        return v - params

    return FactorType(
        name="PriorVector3", var_types=("Vector3",), resid_dim=3, residual=residual
    )
