"""AHRS: preintegrated rotation-only measurements + AHRSFactor.

Reference: navigation/PreintegratedRotation.{h,cpp} (deltaRij, 3x3 rotation
covariance, bias Jacobian delRdelBiasOmega) and navigation/AHRSFactor.h
(3-way factor on Rot_i, Rot_j, gyro bias). Integration is a lax.scan over the
gyro stream — same TPU shape as full IMU preintegration.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


class PreintegratedRotation(NamedTuple):
    deltaR: jnp.ndarray  # [3,3]
    delRdelBiasOmega: jnp.ndarray  # [3,3]
    cov: jnp.ndarray  # [3,3] rotation covariance
    bias_hat: jnp.ndarray  # [3] gyro bias used during integration
    deltaT: jnp.ndarray  # []


def rotation_init(bias_hat=None, dtype=jnp.float64) -> PreintegratedRotation:
    return PreintegratedRotation(
        deltaR=jnp.eye(3, dtype=dtype),
        delRdelBiasOmega=jnp.zeros((3, 3), dtype=dtype),
        cov=jnp.zeros((3, 3), dtype=dtype),
        bias_hat=jnp.zeros(3, dtype=dtype)
        if bias_hat is None
        else jnp.asarray(bias_hat, dtype=dtype),
        deltaT=jnp.zeros((), dtype=dtype),
    )


def integrate_rotation(
    pre: PreintegratedRotation, gyro_cov, omega, dt
) -> PreintegratedRotation:
    """One gyro sample (PreintegratedRotation::integrateGyroMeasurement)."""
    w = omega - pre.bias_hat
    wdt = w * dt
    incrR = so3.expmap(wdt)
    Jr = so3.expmap_derivative(wdt)
    new_H = incrR.T @ pre.delRdelBiasOmega - Jr * dt
    cov = incrR.T @ pre.cov @ incrR + (Jr * dt) @ (gyro_cov / dt) @ (Jr * dt).T
    return PreintegratedRotation(
        deltaR=pre.deltaR @ incrR,
        delRdelBiasOmega=new_H,
        cov=cov,
        bias_hat=pre.bias_hat,
        deltaT=pre.deltaT + dt,
    )


def preintegrate_rotation(gyro_cov, omegas, dts, bias_hat=None) -> PreintegratedRotation:
    omegas = jnp.asarray(omegas)
    pre0 = rotation_init(bias_hat, dtype=omegas.dtype)

    def step(pre, x):
        w, dt = x
        return integrate_rotation(pre, gyro_cov, w, dt), None

    pre, _ = jax.lax.scan(step, pre0, (omegas, jnp.asarray(dts)))
    return pre


def bias_corrected_deltaR(pre: PreintegratedRotation, bias):
    """biasCorrectedDeltaRij: deltaR * Exp(H (b - b_hat))."""
    return pre.deltaR @ so3.expmap(pre.delRdelBiasOmega @ (bias - pre.bias_hat))


@lru_cache(maxsize=None)
def ahrs_factor() -> FactorType:
    """Vars (Rot3_i, Rot3_j, Vector3 gyro bias); params = PreintegratedRotation
    pytree. r = Log((Ri^T Rj)^T * deltaR_corrected) (AHRSFactor::evaluateError).
    Whiten with inv-sqrt of pre.cov."""

    def residual(xs, params):
        Ri, Rj, bias = xs
        pre: PreintegratedRotation = params
        corrected = bias_corrected_deltaR(pre, bias)
        actual = so3.between(Ri, Rj)
        return so3.logmap(so3.between(actual, corrected))

    return FactorType(
        name="AHRSFactor",
        var_types=("Rot3", "Rot3", "Vector3"),
        resid_dim=3,
        residual=residual,
    )
