"""Tests for slam/extra_factors.py (Frobenius, Karcher mean, pose priors,
rotate, essential-matrix, oriented-plane, reference-frame, anti-factor,
planar projection) — mirroring gtsam/slam/tests/*."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import essential as ess
from gtsam_petercdev_tpu.geometry import pose2, pose3, so3
from gtsam_petercdev_tpu.linear import noise, solve as linsolve
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.extra_factors import (
    anti_factor,
    essential_matrix_constraint,
    essential_matrix_factor,
    frobenius_between_factor,
    frobenius_factor,
    karcher_mean_factor,
    oriented_plane3_factor,
    planar_projection_factor,
    pose_rotation_prior,
    pose_translation_prior,
    reference_frame_factor,
    rotate_factor,
    rotate_directions_factor,
)
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor

F64 = jnp.float64


class TestFrobenius:
    def test_between_zero_at_truth(self):
        R1 = so3.expmap(jnp.asarray([0.1, 0.2, 0.3], dtype=F64))
        R12 = so3.expmap(jnp.asarray([-0.2, 0.1, 0.4], dtype=F64))
        R2 = so3.compose(R1, R12)
        ft = frobenius_between_factor()
        r = ft.residual((R1, R2), R12)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)

    def test_optimize_rotation_chain(self):
        # Frobenius between factors recover a rotation chain
        ft = frobenius_between_factor()
        graph = NonlinearFactorGraph()
        values = Values()
        true = [so3.identity(F64)]
        rng = np.random.default_rng(1)
        for i in range(4):
            true.append(
                so3.compose(true[-1], so3.expmap(jnp.asarray(rng.normal(size=3) * 0.4, dtype=F64)))
            )
        for i, R in enumerate(true):
            eps = jnp.asarray(rng.normal(size=3) * 0.1, dtype=F64) if i else jnp.zeros(3, dtype=F64)
            values.insert(i, "Rot3", so3.retract(R, eps))
        graph.add(prior_factor("Rot3"), [0], true[0], noise.isotropic(3, 0.001, F64))
        for i in range(4):
            graph.add(
                ft, [i, i + 1], so3.between(true[i], true[i + 1]),
                noise.isotropic(9, 0.1, F64),
            )
        res = optimizers.levenberg_marquardt(graph, values)
        for i, R in enumerate(true):
            err = so3.logmap(so3.between(res.values.at(i), R))
            assert float(jnp.linalg.norm(err)) < 1e-5


class TestKarcherMean:
    def test_gauge_constraint(self):
        ft = karcher_mean_factor(3)
        Rs = [so3.expmap(jnp.asarray(w, dtype=F64)) for w in
              ([0.1, 0, 0], [-0.1, 0, 0], [0, 0, 0])]
        r = ft.residual(tuple(Rs), None)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


class TestPosePriors:
    def test_rotation_prior(self):
        ft = pose_rotation_prior()
        graph = NonlinearFactorGraph()
        values = Values()
        R_target = so3.expmap(jnp.asarray([0.2, -0.1, 0.3], dtype=F64))
        p0 = pose3.Pose3(jnp.eye(3, dtype=F64), jnp.asarray([1.0, 2.0, 3.0], dtype=F64))
        values.insert(0, "Pose3", p0)
        graph.add(ft, [0], R_target, noise.isotropic(3, 0.1, F64))
        graph.add(
            pose_translation_prior(), [0], jnp.asarray([5.0, 0.0, 0.0], dtype=F64),
            noise.isotropic(3, 0.1, F64),
        )
        res = optimizers.levenberg_marquardt(graph, values)
        p = res.values.at(0)
        np.testing.assert_allclose(np.asarray(p.R), np.asarray(R_target), atol=1e-6)
        np.testing.assert_allclose(np.asarray(p.t), [5, 0, 0], atol=1e-6)


class TestRotate:
    def test_rotate_factor_recovery(self):
        # recover a fixed rotation from paired vectors p_i = R z_i
        R_true = so3.expmap(jnp.asarray([0.3, 0.2, -0.4], dtype=F64))
        ft = rotate_factor()
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Rot3", so3.identity(F64))
        rng = np.random.default_rng(7)
        for _ in range(5):
            z = jnp.asarray(rng.normal(size=3), dtype=F64)
            p = so3.rotate(R_true, z)
            graph.add(ft, [0], {"p": p, "z": z}, noise.isotropic(3, 0.01, F64))
        res = optimizers.levenberg_marquardt(graph, values)
        err = so3.logmap(so3.between(res.values.at(0), R_true))
        assert float(jnp.linalg.norm(err)) < 1e-6

    def test_rotate_directions(self):
        R_true = so3.expmap(jnp.asarray([0.1, 0.5, -0.2], dtype=F64))
        ft = rotate_directions_factor()
        z = jnp.asarray([0.0, 0.0, 1.0], dtype=F64)
        p = so3.rotate(R_true, z)
        r = ft.residual((R_true,), {"p": p, "z": z})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


class TestEssential:
    def test_epipolar_zero(self):
        R = so3.expmap(jnp.asarray([0.05, -0.03, 0.1], dtype=F64))
        t = jnp.asarray([1.0, 0.2, -0.1], dtype=F64)
        E = ess.essential_from_pose(R, t)
        ft = essential_matrix_factor()
        # construct a consistent pair: P in cam2; x2 = P, x1 = R P + t (up to scale)
        P2 = jnp.asarray([0.3, -0.2, 2.0], dtype=F64)
        P1 = so3.rotate(R, P2) + t
        pA = (P1 / P1[2])[:2]
        pB = (P2 / P2[2])[:2]
        r = ft.residual((E,), {"pA": pA, "pB": pB})
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)

    def test_constraint_zero_at_truth(self):
        p1 = pose3.expmap(jnp.asarray([0.1, 0, 0, 0, 0, 0], dtype=F64))
        p2 = pose3.expmap(jnp.asarray([0.1, 0.2, 0, 1.0, 0.5, -0.2], dtype=F64))
        rel = pose3.between(p1, p2)
        E = ess.essential_from_pose(rel.R, rel.t)
        ft = essential_matrix_constraint()
        r = ft.residual((p1, p2), E)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


class TestOrientedPlane:
    def test_factor_zero_at_truth(self):
        plane = ess.plane_from_coeffs(0.0, 0.0, 1.0, -2.0)
        pose = pose3.expmap(jnp.asarray([0.0, 0.0, 0.3, 1.0, -0.5, 0.1], dtype=F64))
        measured = ess.plane_transform(plane, pose.R, pose.t)
        ft = oriented_plane3_factor()
        r = ft.residual((pose, plane), measured)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)


class TestReferenceFrame:
    def test_recovery_of_transform(self):
        ft = reference_frame_factor()
        T_true = pose3.expmap(jnp.asarray([0.2, -0.1, 0.3, 1.0, 2.0, -0.5], dtype=F64))
        graph = NonlinearFactorGraph()
        values = Values()
        rng = np.random.default_rng(3)
        values.insert(100, "Pose3", pose3.identity(F64))
        for i in range(4):
            local = jnp.asarray(rng.normal(size=3) * 2.0, dtype=F64)
            glob = pose3.transform_from(T_true, local)
            values.insert(i, "Point3", glob)
            values.insert(10 + i, "Point3", local)
            graph.add(
                prior_factor("Point3"), [i], glob, noise.isotropic(3, 0.01, F64)
            )
            graph.add(
                prior_factor("Point3"), [10 + i], local, noise.isotropic(3, 0.01, F64)
            )
            graph.add(
                ft, [i, 100, 10 + i], None, noise.isotropic(3, 0.05, F64)
            )
        res = optimizers.levenberg_marquardt(graph, values)
        T = res.values.at(100)
        err = pose3.logmap(pose3.between(T, T_true))
        assert float(jnp.linalg.norm(err)) < 1e-4


class TestAntiFactor:
    def test_information_cancellation(self):
        # prior + between + anti-between == prior alone (dense H,g equal)
        bf = between_factor("Pose2")
        graph1 = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Pose2", pose2.make(0.0, 0.0, 0.0))
        values.insert(1, "Pose2", pose2.make(1.1, 0.1, 0.05))
        meas = pose2.make(1.0, 0.0, 0.0)
        graph1.add(prior_factor("Pose2"), [0], pose2.identity(F64), noise.isotropic(3, 0.1, F64))
        graph1.add(prior_factor("Pose2"), [1], meas, noise.isotropic(3, 0.5, F64))

        graph2 = NonlinearFactorGraph()
        graph2.add(prior_factor("Pose2"), [0], pose2.identity(F64), noise.isotropic(3, 0.1, F64))
        graph2.add(prior_factor("Pose2"), [1], meas, noise.isotropic(3, 0.5, F64))
        graph2.add(bf, [0, 1], meas, noise.isotropic(3, 0.2, F64))
        graph2.add(anti_factor(bf), [0, 1], meas, noise.isotropic(3, 0.2, F64), sign=-1.0)

        H1, g1 = linsolve.assemble_dense(graph1.linearize(values))
        H2, g2 = linsolve.assemble_dense(graph2.linearize(values))
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), atol=1e-10)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)


class TestPlanarProjection:
    def test_zero_at_truth(self):
        ft = planar_projection_factor()
        wTb = pose2.make(1.0, 2.0, 0.3)
        # camera at body origin looking forward (+x body) — use identity
        # camera orientation = camera z along body x
        Rbc = jnp.asarray(
            [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype=F64
        )
        landmark = jnp.asarray([5.0, 2.5, 1.0], dtype=F64)
        cal = jnp.asarray([100.0, 100.0, 0.0, 320.0, 240.0], dtype=F64)
        params = {
            "landmark": landmark,
            "cal": cal,
            "body_P_cam_R": Rbc,
            "body_P_cam_t": jnp.zeros(3, dtype=F64),
            "measured": jnp.zeros(2, dtype=F64),
        }
        r0 = ft.residual((jnp.asarray(wTb, dtype=F64),), params)
        params2 = dict(params)
        params2["measured"] = r0  # measurement = prediction -> zero residual
        r = ft.residual((jnp.asarray(wTb, dtype=F64),), params2)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)
