"""IMU preintegration tests (the reference's Scenario/ScenarioRunner pattern:
closed-form trajectories + Monte-Carlo covariance consistency)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.navigation import preintegration as pre
from gtsam_petercdev_tpu.navigation.factors import (
    combined_covariance,
    gps_factor,
    imu_factor,
    velocity_prior,
)
from gtsam_petercdev_tpu.navigation.navstate import NavState
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import OptimizerParams, gauss_newton
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import prior_factor

G = 9.81


def _constant_twist_scenario(T=1.0, dt=1e-3):
    """Body angular rate w, constant nav-frame acceleration A (closed form)."""
    w = jnp.asarray([0.1, -0.2, 0.3])
    A = jnp.asarray([0.3, 0.1, -0.2])  # nav-frame accel
    g = jnp.asarray([0.0, 0.0, -G])
    n = int(T / dt)
    ts = (np.arange(n) + 0.0) * dt  # sample start times (ZOH)
    Rs = so3.expmap(jnp.asarray(ts)[:, None] * w[None, :])  # R(t) = Exp(w t)
    acc_b = so3.unrotate(Rs, (A - g)[None, :])  # specific force
    omega_b = jnp.broadcast_to(w, (n, 3))
    dts = jnp.full((n,), dt)
    # closed-form final state (from R0=I, p0=0, v0 given)
    v0 = jnp.asarray([0.5, -0.1, 0.2])
    RT = so3.expmap(w * T)
    pT = v0 * T + 0.5 * A * T * T
    vT = v0 + A * T
    return (acc_b, omega_b, dts), (v0, NavState(RT, pT, vT))


def test_preintegration_matches_closed_form():
    params = pre.default_params(dtype=jnp.float64)
    (acc, om, dts), (v0, want) = _constant_twist_scenario()
    pim = pre.preintegrate(params, acc, om, dts)
    state0 = NavState(jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, dtype=jnp.float64), v0)
    got = pre.predict(pim, params, state0, jnp.zeros(6, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(got.R), np.asarray(want.R), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(want.v), atol=2e-3)


def test_bias_correction_first_order():
    params = pre.default_params(dtype=jnp.float64)
    (acc, om, dts), _ = _constant_twist_scenario(T=0.5)
    b_hat = jnp.zeros(6, dtype=jnp.float64)
    db = jnp.asarray([2e-3, -1e-3, 1e-3, -5e-4, 8e-4, 3e-4])
    pim0 = pre.preintegrate(params, acc, om, dts, bias_hat=b_hat)
    pim1 = pre.preintegrate(params, acc, om, dts, bias_hat=db)
    # first-order corrected delta at bias db from pim0 should match pim1's
    # exact delta at its own bias_hat
    xi_corr = pre.bias_corrected_delta(pim0, db)
    xi_exact = pre.bias_corrected_delta(pim1, db)
    np.testing.assert_allclose(np.asarray(xi_corr), np.asarray(xi_exact), atol=5e-6)


def test_covariance_monte_carlo():
    """pim.cov must match the sample covariance of preintegration outputs
    under measurement noise (ScenarioRunner's consistency check)."""
    dtype = jnp.float64
    accel_sigma, gyro_sigma = 0.1, 0.02
    params = pre.default_params(accel_sigma=accel_sigma, gyro_sigma=gyro_sigma,
                                integration_sigma=0.0, dtype=dtype)
    (acc, om, dts), _ = _constant_twist_scenario(T=0.5, dt=1e-2)
    pim = pre.preintegrate(params, acc, om, dts)

    def run(key):
        k1, k2 = jax.random.split(key)
        dt = dts[0]
        # discrete noise: sigma/sqrt(dt)
        acc_n = acc + jax.random.normal(k1, acc.shape, dtype) * accel_sigma / jnp.sqrt(dt)
        om_n = om + jax.random.normal(k2, om.shape, dtype) * gyro_sigma / jnp.sqrt(dt)
        p = pre.preintegrate(params, acc_n, om_n, dts)
        return jnp.concatenate(
            [so3.logmap(so3.between(pim.deltaR, p.deltaR)), p.deltaP - pim.deltaP,
             p.deltaV - pim.deltaV]
        )

    keys = jax.random.split(jax.random.PRNGKey(0), 400)
    samples = jax.vmap(run)(keys)
    mc_cov = np.cov(np.asarray(samples).T)
    want = np.asarray(pim.cov)
    # compare the diagonal at 25% relative tolerance (MC noise)
    d_mc, d_an = np.diag(mc_cov), np.diag(want)
    np.testing.assert_allclose(d_mc, d_an, rtol=0.25)


def test_imu_factor_graph_recovers_trajectory():
    """3-state chain: priors on first state + IMU factors; GN recovers the
    true trajectory from a perturbed initial guess."""
    dtype = jnp.float64
    params = pre.default_params(dtype=dtype)
    rng = np.random.default_rng(3)

    # two segments of the closed-form scenario
    (acc, om, dts), (v0, s1) = _constant_twist_scenario(T=1.0, dt=1e-3)
    pim = pre.preintegrate(params, acc, om, dts)
    state0 = NavState(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), v0)
    state1 = pre.predict(pim, params, state0, jnp.zeros(6, dtype=dtype))

    X, V, B = 0, 10, 20
    graph = NonlinearFactorGraph()
    values = Values()
    values.insert(X + 0, "Pose3", Pose3(state0.R, state0.t))
    values.insert(X + 1, "Pose3",
                  pose3.retract(Pose3(state1.R, state1.t), jnp.asarray(rng.normal(size=6) * 0.05)))
    values.insert(V + 0, "Vector3", state0.v)
    values.insert(V + 1, "Vector3", state1.v + jnp.asarray(rng.normal(size=3) * 0.05))
    values.insert(B + 0, "ConstantBias", jnp.zeros(6, dtype=dtype))

    graph.add(prior_factor("Pose3"), [X + 0], Pose3(state0.R, state0.t),
              noise.isotropic(6, 1e-4, dtype))
    graph.add(velocity_prior(), [V + 0], state0.v, noise.isotropic(3, 1e-4, dtype))
    graph.add(prior_factor("ConstantBias"), [B + 0], jnp.zeros(6, dtype=dtype),
              noise.isotropic(6, 1e-3, dtype))
    sqrt_info = noise.gaussian_covariance(np.asarray(pim.cov) + 1e-12 * np.eye(9))
    graph.add(
        imu_factor(), [X + 0, V + 0, X + 1, V + 1, B + 0],
        {"pim": pim, "n_gravity": params.n_gravity}, sqrt_info,
    )

    res = gauss_newton(graph, values, OptimizerParams(max_iterations=30))
    assert res.error < 1e-8
    got = res.values.at(X + 1)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(state1.t), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res.values.at(V + 1)), np.asarray(state1.v), atol=1e-5
    )


def test_gps_factor():
    graph = NonlinearFactorGraph()
    values = Values()
    p = Pose3(jnp.eye(3, dtype=jnp.float64), jnp.asarray([1.0, 2.0, 3.0]))
    values.insert(0, "Pose3", pose3.retract(p, jnp.asarray([0.1, 0, 0, 0.2, -0.1, 0.3])))
    graph.add(gps_factor(), [0], jnp.asarray([1.0, 2.0, 3.0]), noise.isotropic(3, 0.01, jnp.float64))
    graph.add(prior_factor("Pose3"), [0], p, noise.isotropic(6, 10.0, jnp.float64))
    res = gauss_newton(graph, values, OptimizerParams(max_iterations=20))
    np.testing.assert_allclose(np.asarray(res.values.at(0).t), [1.0, 2.0, 3.0], atol=1e-4)
