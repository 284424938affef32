"""Tests for attitude/mag/barometric/constant-velocity factors, AHRS
preintegrated rotation, and Scenario/ScenarioRunner (mirrors
gtsam/navigation/tests/testAttitudeFactor.cpp, testMagFactor.cpp,
testAHRSFactor.cpp, testScenario*.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import pose3, so3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.navigation import ahrs
from gtsam_petercdev_tpu.navigation import preintegration as pre
from gtsam_petercdev_tpu.navigation.extra_factors import (
    barometric_factor,
    constant_velocity_factor,
    mag_factor,
    mag_factor_calibration,
    pose3_attitude_factor,
    rot3_attitude_factor,
)
from gtsam_petercdev_tpu.navigation.navstate import NavState
from gtsam_petercdev_tpu.navigation.scenario import (
    AcceleratingScenario,
    ScenarioRunner,
    constant_twist,
)
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values

F64 = jnp.float64


class TestAttitudeFactor:
    def test_zero_error_at_truth(self):
        ft = rot3_attitude_factor()
        R = so3.expmap(jnp.asarray([0.1, -0.2, 0.3], dtype=F64))
        bRef = jnp.asarray([0.0, 0.0, 1.0], dtype=F64)
        nZ = so3.rotate(R, bRef)
        r = ft.residual((R,), {"nZ": nZ, "bRef": bRef})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_optimization_aligns_attitude(self):
        # one attitude measurement fixes roll/pitch of a Rot3
        ft = rot3_attitude_factor()
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Rot3", so3.expmap(jnp.asarray([0.3, -0.2, 0.0], dtype=F64)))
        nZ = jnp.asarray([0.0, 0.0, 1.0], dtype=F64)
        bRef = jnp.asarray([0.0, 0.0, 1.0], dtype=F64)
        graph.add(ft, [0], {"nZ": nZ, "bRef": bRef}, noise.isotropic(2, 0.25, F64))
        res = optimizers.levenberg_marquardt(graph, values)
        R = np.asarray(res.values.at(0))
        # body z now aligned with nav z
        np.testing.assert_allclose(R @ [0, 0, 1], [0, 0, 1], atol=1e-6)

    def test_pose3_variant_jacobian(self):
        ft = pose3_attitude_factor()
        p = pose3.expmap(jnp.asarray([0.1, 0.2, -0.1, 1.0, 2.0, 3.0], dtype=F64))
        params = {
            "nZ": jnp.asarray([0.0, 0.1, 0.99], dtype=F64) / np.sqrt(0.1**2 + 0.99**2),
            "bRef": jnp.asarray([0.0, 0.0, 1.0], dtype=F64),
        }
        r = ft.residual((p,), params)
        assert r.shape == (2,)
        assert np.all(np.isfinite(np.asarray(r)))


class TestMagFactor:
    def test_zero_at_truth_and_recovery(self):
        R_true = so3.expmap(jnp.asarray([0.0, 0.0, 0.7], dtype=F64))
        direction = jnp.asarray([0.4, 0.5, -0.77], dtype=F64)
        direction = direction / jnp.linalg.norm(direction)
        scale = jnp.asarray(25000.0, dtype=F64)
        bias = jnp.asarray([10.0, -5.0, 3.0], dtype=F64)
        measured = scale * so3.unrotate(R_true, direction) + bias
        ft = mag_factor()
        params = {
            "measured": measured, "scale": scale,
            "direction": direction, "bias": bias,
        }
        r = ft.residual((R_true,), params)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-8)

    def test_calibration_recovery(self):
        # known attitude, solve for scale + bias
        nRb = so3.expmap(jnp.asarray([0.1, 0.2, 0.3], dtype=F64))
        direction = jnp.asarray([0.0, 1.0, 0.0], dtype=F64)
        scale_true, bias_true = 2.5, np.array([0.1, -0.2, 0.05])
        measured = scale_true * so3.unrotate(nRb, direction) + jnp.asarray(
            bias_true, dtype=F64
        )
        ft = mag_factor_calibration()
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Vector1", jnp.asarray([1.0], dtype=F64))
        values.insert(1, "Vector3", jnp.zeros(3, dtype=F64))
        # need 2 measurements with distinct attitudes for full rank
        nRb2 = so3.expmap(jnp.asarray([-0.3, 0.5, 0.1], dtype=F64))
        measured2 = scale_true * so3.unrotate(nRb2, direction) + jnp.asarray(
            bias_true, dtype=F64
        )
        for R, m in [(nRb, measured), (nRb2, measured2)]:
            graph.add(
                ft, [0, 1],
                {"measured": m, "nRb": R, "direction": direction},
                noise.isotropic(3, 1.0, F64),
            )
        res = optimizers.gauss_newton(graph, values)
        assert float(res.values.at(0)[0]) == pytest.approx(scale_true, abs=1e-8)
        np.testing.assert_allclose(np.asarray(res.values.at(1)), bias_true, atol=1e-8)


class TestBarometric:
    def test_residual_and_solve(self):
        ft = barometric_factor()
        graph = NonlinearFactorGraph()
        values = Values()
        p0 = pose3.identity(F64)
        values.insert(0, "Pose3", p0)
        values.insert(1, "Vector1", jnp.zeros(1, dtype=F64))
        # altitude measured 5.0 with bias 0 prior; plus a weak pose prior
        from gtsam_petercdev_tpu.slam.factors import prior_factor

        target = pose3.Pose3(jnp.eye(3, dtype=F64), jnp.asarray([0.0, 0.0, 5.0], dtype=F64))
        graph.add(ft, [0, 1], jnp.asarray([5.0], dtype=F64), noise.isotropic(1, 0.1, F64))
        graph.add(prior_factor("Pose3"), [0], target, noise.isotropic(6, 1.0, F64))
        graph.add(
            prior_factor("Vector1"), [1], jnp.zeros(1, dtype=F64),
            noise.isotropic(1, 0.01, F64),
        )
        res = optimizers.levenberg_marquardt(graph, values)
        z = float(np.asarray(res.values.at(0).t)[2]) + float(res.values.at(1)[0])
        assert z == pytest.approx(5.0, abs=1e-2)


class TestConstantVelocity:
    def test_zero_at_consistent_pair(self):
        ft = constant_velocity_factor()
        v = jnp.asarray([1.0, 2.0, 0.5], dtype=F64)
        x1 = NavState(jnp.eye(3, dtype=F64), jnp.zeros(3, dtype=F64), v)
        dt = jnp.asarray(0.5, dtype=F64)
        x2 = NavState(x1.R, x1.t + v * 0.5, v)
        r = ft.residual((x1, x2), {"dt": dt})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


class TestAHRS:
    def test_preintegrated_rotation_matches_closed_form(self):
        w = np.array([0.1, -0.3, 0.2])
        dt = 0.01
        n = 100
        gyro_cov = jnp.eye(3, dtype=F64) * 1e-6
        pim = ahrs.preintegrate_rotation(
            gyro_cov,
            jnp.asarray(np.tile(w, (n, 1)), dtype=F64),
            jnp.full((n,), dt, dtype=F64),
        )
        expected = so3.expmap(jnp.asarray(w * n * dt, dtype=F64))
        np.testing.assert_allclose(np.asarray(pim.deltaR), np.asarray(expected), atol=1e-9)
        assert float(pim.deltaT) == pytest.approx(1.0)
        # covariance grew and is symmetric PSD
        cov = np.asarray(pim.cov)
        assert np.all(np.linalg.eigvalsh(cov) >= 0)
        assert cov[0, 0] > 0

    def test_ahrs_factor_zero_at_truth(self):
        w = np.array([0.0, 0.0, 0.5])
        n, dt = 50, 0.02
        gyro_cov = jnp.eye(3, dtype=F64) * 1e-6
        pim = ahrs.preintegrate_rotation(
            gyro_cov, jnp.asarray(np.tile(w, (n, 1)), dtype=F64),
            jnp.full((n,), dt, dtype=F64),
        )
        Ri = so3.identity(F64)
        Rj = so3.expmap(jnp.asarray(w * n * dt, dtype=F64))
        ft = ahrs.ahrs_factor()
        r = ft.residual((Ri, Rj, jnp.zeros(3, dtype=F64)), pim)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)

    def test_ahrs_factor_bias_correction_firstorder(self):
        w = np.array([0.2, 0.1, -0.3])
        bias = np.array([0.01, -0.02, 0.005])
        n, dt = 100, 0.01
        gyro_cov = jnp.eye(3, dtype=F64) * 1e-8
        # integrate biased measurements with zero bias_hat
        pim = ahrs.preintegrate_rotation(
            gyro_cov, jnp.asarray(np.tile(w + bias, (n, 1)), dtype=F64),
            jnp.full((n,), dt, dtype=F64),
        )
        Ri = so3.identity(F64)
        Rj = so3.expmap(jnp.asarray(w * n * dt, dtype=F64))
        ft = ahrs.ahrs_factor()
        r = ft.residual((Ri, Rj, jnp.asarray(bias, dtype=F64)), pim)
        # first-order bias correction: residual small (not exactly 0)
        assert float(jnp.linalg.norm(r)) < 1e-4


class TestScenario:
    def test_constant_twist_circle(self):
        # yaw rate + forward velocity = circle; radius = v/w
        w, v = 0.3, 2.0
        sc = constant_twist([0, 0, w], [v, 0, 0])
        T = 2 * np.pi / w  # full circle
        s = sc.nav_state(jnp.asarray(T, dtype=F64))
        np.testing.assert_allclose(np.asarray(s.t), [0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s.R), np.eye(3), atol=1e-6)

    def test_runner_prediction_matches_scenario(self):
        w, v = 0.2, 1.5
        sc = constant_twist([0, 0, w], [v, 0, 0])
        params = pre.default_params(
            g=9.81, accel_sigma=0.0, gyro_sigma=0.0, integration_sigma=0.0
        )
        runner = ScenarioRunner(sc, params, dt=1e-3)
        T = 1.0
        pim = runner.integrate(T)
        predicted = runner.predict(pim, sc.nav_state(0.0))
        expected = sc.nav_state(jnp.asarray(T, dtype=F64))
        np.testing.assert_allclose(np.asarray(predicted.R), np.asarray(expected.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(predicted.t), np.asarray(expected.t), atol=1e-3)
        np.testing.assert_allclose(np.asarray(predicted.v), np.asarray(expected.v), atol=1e-3)

    def test_accelerating_scenario(self):
        a = np.array([0.3, 0.0, 0.0])
        sc = AcceleratingScenario(
            R0=jnp.eye(3, dtype=F64),
            t0=jnp.zeros(3, dtype=F64),
            v0=jnp.asarray([1.0, 0.0, 0.0], dtype=F64),
            a_n=jnp.asarray(a, dtype=F64),
            w_b=jnp.zeros(3, dtype=F64),
        )
        params = pre.default_params(accel_sigma=0.0, gyro_sigma=0.0, integration_sigma=0.0)
        runner = ScenarioRunner(sc, params, dt=1e-3)
        T = 2.0
        predicted = runner.predict(runner.integrate(T), sc.nav_state(0.0))
        np.testing.assert_allclose(
            np.asarray(predicted.t), [1.0 * T + 0.5 * 0.3 * T * T, 0, 0], atol=1e-3
        )

    def test_monte_carlo_covariance_consistent(self):
        # preintegrated covariance should match sampled covariance (loose)
        sc = constant_twist([0, 0, 0.1], [1.0, 0, 0])
        params = pre.default_params(
            accel_sigma=0.05, gyro_sigma=0.005, integration_sigma=0.0
        )
        runner = ScenarioRunner(sc, params, dt=0.01)
        T = 0.5
        pim = runner.integrate(T)
        est = runner.estimate_covariance(T, runs=60, initial=sc.nav_state(0.0), seed=3)
        ana = np.asarray(pim.cov)
        # compare rotation block standard deviations within 40%
        for i in range(3):
            assert est[i, i] == pytest.approx(ana[i, i], rel=0.6)
