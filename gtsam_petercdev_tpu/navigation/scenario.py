"""IMU trajectory scenarios + Monte-Carlo-capable runner.

Reference: navigation/Scenario.h (ConstantTwistScenario, AcceleratingScenario
closed-form trajectories) and navigation/ScenarioRunner.h (generates perfect
IMU measurements from a scenario, integrates them, and compares the
preintegrated covariance against sampling). Used by the preintegration tests
as a ground-truth oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.navigation import preintegration as pre
from gtsam_petercdev_tpu.navigation.navstate import NavState


class ConstantTwistScenario(NamedTuple):
    """Body twist (w, v) constant: pose(t) = Exp(t [w; v]) composed on start.

    omega_b is constant; velocity/acceleration follow the screw motion
    (Scenario.h ConstantTwistScenario).
    """

    w: jnp.ndarray  # [3] body angular velocity
    v: jnp.ndarray  # [3] body linear velocity
    R0: jnp.ndarray  # [3,3] initial attitude
    t0: jnp.ndarray  # [3] initial position

    def rotation(self, t):
        return self.R0 @ so3.expmap(self.w * t)

    def position(self, t):
        # integrate v in the rotating frame: closed form via SE(3) expmap
        from gtsam_petercdev_tpu.geometry import pose3

        xi = jnp.concatenate([self.w, self.v]) * t
        p = pose3.expmap(xi)
        return self.t0 + so3.rotate(self.R0, p.t)

    def velocity_n(self, t):
        return so3.rotate(self.rotation(t), self.v)

    def omega_b(self, t):
        return self.w

    def acceleration_n(self, t):
        # d/dt (R(t) v) = R(t) (w x v)
        return so3.rotate(self.rotation(t), jnp.cross(self.w, self.v))

    def nav_state(self, t) -> NavState:
        return NavState(self.rotation(t), self.position(t), self.velocity_n(t))


def constant_twist(w, v, R0=None, t0=None, dtype=jnp.float64) -> ConstantTwistScenario:
    return ConstantTwistScenario(
        w=jnp.asarray(w, dtype=dtype),
        v=jnp.asarray(v, dtype=dtype),
        R0=jnp.eye(3, dtype=dtype) if R0 is None else jnp.asarray(R0, dtype=dtype),
        t0=jnp.zeros(3, dtype=dtype) if t0 is None else jnp.asarray(t0, dtype=dtype),
    )


class AcceleratingScenario(NamedTuple):
    """Constant nav-frame acceleration + constant body rotation rate
    (Scenario.h AcceleratingScenario)."""

    R0: jnp.ndarray
    t0: jnp.ndarray
    v0: jnp.ndarray  # [3] initial nav velocity
    a_n: jnp.ndarray  # [3] constant nav acceleration
    w_b: jnp.ndarray  # [3] constant body angular velocity

    def rotation(self, t):
        return self.R0 @ so3.expmap(self.w_b * t)

    def position(self, t):
        return self.t0 + self.v0 * t + 0.5 * self.a_n * t * t

    def velocity_n(self, t):
        return self.v0 + self.a_n * t

    def omega_b(self, t):
        return self.w_b

    def acceleration_n(self, t):
        return self.a_n

    def nav_state(self, t) -> NavState:
        return NavState(self.rotation(t), self.position(t), self.velocity_n(t))


class ScenarioRunner:
    """Generate IMU measurements from a scenario; integrate and validate.

    measured_omega = omega_b + gyro bias (+ noise)
    measured_acc   = R^T (a_n - g) + accel bias (+ noise)   [specific force]
    (ScenarioRunner.h:52-90)
    """

    def __init__(self, scenario, params: pre.PreintegrationParams, dt: float,
                 bias=None):
        self.scenario = scenario
        self.params = params
        self.dt = float(dt)
        dtype = params.n_gravity.dtype
        self.bias = (
            jnp.zeros(6, dtype=dtype) if bias is None else jnp.asarray(bias, dtype=dtype)
        )

    def actual_specific_force(self, t):
        R = self.scenario.rotation(t)
        return so3.unrotate(R, self.scenario.acceleration_n(t) - self.params.n_gravity)

    def measured_series(self, T: float, rng: np.random.Generator | None = None):
        """Sample times + (acc, omega, dt) arrays over [0, T)."""
        n = int(round(T / self.dt))
        ts = jnp.asarray(np.arange(n) * self.dt, dtype=self.params.n_gravity.dtype)
        acc = jax.vmap(self.actual_specific_force)(ts) + self.bias[:3]
        omega = jax.vmap(self.scenario.omega_b)(ts) + self.bias[3:]
        if rng is not None:
            # discrete-time noise: sigma/sqrt(dt)
            sa = float(np.sqrt(self.params.accel_cov[0, 0] / self.dt))
            sw = float(np.sqrt(self.params.gyro_cov[0, 0] / self.dt))
            acc = acc + jnp.asarray(rng.normal(size=(n, 3)) * sa, dtype=acc.dtype)
            omega = omega + jnp.asarray(rng.normal(size=(n, 3)) * sw, dtype=omega.dtype)
        dts = jnp.full((n,), self.dt, dtype=acc.dtype)
        return acc, omega, dts

    def integrate(self, T: float, bias_hat=None, rng=None) -> pre.PIM:
        acc, omega, dts = self.measured_series(T, rng)
        return pre.preintegrate(self.params, acc, omega, dts, bias_hat)

    def predict(self, pim: pre.PIM, initial: NavState, bias_hat=None) -> NavState:
        b = jnp.zeros(6, dtype=pim.bias_hat.dtype) if bias_hat is None else bias_hat
        return pre.predict(pim, self.params, initial, b)

    def estimate_covariance(self, T: float, runs: int, initial: NavState,
                            seed: int = 0):
        """Monte-Carlo covariance of the predicted nav state (the reference's
        ScenarioRunner::estimateCovariance oracle)."""
        rng = np.random.default_rng(seed)
        samples = []
        from gtsam_petercdev_tpu.navigation.navstate import local as ns_local

        clean = self.predict(self.integrate(T), initial)
        for _ in range(runs):
            pim = self.integrate(T, rng=rng)
            s = self.predict(pim, initial)
            samples.append(np.asarray(ns_local(clean, s)))
        X = np.stack(samples)
        X = X - X.mean(axis=0)
        return X.T @ X / (len(samples) - 1)
