"""Tests for slam/extra_factors.py (Frobenius, Karcher mean, pose priors,
rotate, essential-matrix, oriented-plane, reference-frame, anti-factor,
planar projection) — mirroring gtsam/slam/tests/*."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import essential as ess
from gtsam_petercdev_tpu.geometry import pose2, pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
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


# ---------------------------------------------------------------------------
# gtsam_unstable factor breadth (rolling shutter, EM, inv-depth, smart stereo)
# ---------------------------------------------------------------------------


def test_rolling_shutter_projection():
    from gtsam_petercdev_tpu.slam import unstable_factors as uf
    from gtsam_petercdev_tpu.geometry import cameras as cams

    K = jnp.asarray([500.0, 500.0, 0.0, 320.0, 240.0])
    pa = Pose3(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.0]))
    pb = Pose3(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]))
    pt = jnp.asarray([0.3, -0.2, 4.0])
    ft = uf.projection_factor_rolling_shutter()
    # alpha endpoints reduce to plain projection at A and B
    for alpha, pose in [(0.0, pa), (1.0, pb), (0.5, None)]:
        r = ft.residual(
            (pa, pb, pt), {"uv": jnp.zeros(2), "K": K, "alpha": jnp.asarray(alpha)}
        )
        if pose is not None:
            uv_ref, _ = cams.project_s2(pose, pt, K)
            np.testing.assert_allclose(np.asarray(r), np.asarray(uv_ref), atol=1e-9)
    # interpolated pose is between the endpoints
    mid = uf.interpolate_pose3(pa, pb, 0.5)
    np.testing.assert_allclose(np.asarray(mid.t), [0.5, 0.0, 0.0], atol=1e-12)
    # jacfwd oracle: residual differentiable and nonzero in all slots
    J = jax.jacfwd(
        lambda p: ft.residual((pa, Pose3(pb.R, p), pt),
                              {"uv": jnp.zeros(2), "K": K, "alpha": jnp.asarray(0.7)})
    )(pb.t)
    assert np.abs(np.asarray(J)).max() > 1e-3


def test_between_factor_em_inlier_outlier():
    from gtsam_petercdev_tpu.slam import unstable_factors as uf

    ft = uf.between_factor_em("Pose2")
    x1 = jnp.zeros(3)
    x2 = jnp.asarray([1.0, 0.0, 0.0])
    params = {
        "measured": jnp.asarray([1.0, 0.0, 0.0]),
        "R_in": jnp.eye(3) / 0.1,   # tight inlier model
        "R_out": jnp.eye(3) / 10.0,  # wide outlier model
        "prior_in": jnp.asarray(0.5),
        "prior_out": jnp.asarray(0.5),
    }
    # consistent measurement -> inlier branch dominates
    r = np.asarray(ft.residual((x1, x2), params))
    assert np.linalg.norm(r[:3]) < 1e-6 and np.linalg.norm(r[3:]) < 1e-6
    # wildly inconsistent measurement -> outlier responsibility ~1, so the
    # residual is dominated by the WIDE model (bounded influence)
    params_bad = dict(params, measured=jnp.asarray([30.0, 0.0, 0.0]))
    r2 = np.asarray(ft.residual((x1, x2), params_bad))
    assert np.linalg.norm(r2[:3]) < 1e-10  # sqrt(p_in) ~ 0 kills inlier part
    assert np.linalg.norm(r2[3:]) < 5.0   # whitened by sigma=10 outlier model


def test_inv_depth_factor3_roundtrip():
    from gtsam_petercdev_tpu.slam import unstable_factors as uf
    from gtsam_petercdev_tpu.geometry import cameras as cams

    K = jnp.asarray([500.0, 500.0, 0.0, 320.0, 240.0])
    pose = Pose3(jnp.eye(3), jnp.asarray([0.2, -0.1, 0.0]))
    uv = jnp.asarray([350.0, 230.0])
    ray5, rho = uf.inv_depth_backproject(pose, K, uv, 5.0)
    pt = uf.inv_depth_to_point(ray5, rho)
    uv_back, depth = cams.project_s2(pose, pt, K)
    np.testing.assert_allclose(np.asarray(uv_back), np.asarray(uv), atol=1e-8)
    ft = uf.inv_depth_factor3()
    r = ft.residual((pose, ray5, rho[None]), {"uv": uv, "K": K})
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-8)
    # inverse depth is unobservable from the anchor view (zero parallax)...
    J0 = jax.jacfwd(lambda q: ft.residual((pose, ray5, q), {"uv": uv, "K": K}))(
        rho[None]
    )
    np.testing.assert_allclose(np.asarray(J0), 0.0, atol=1e-9)
    # ...and observable from a translated view (jacfwd oracle)
    pose2_ = Pose3(pose.R, pose.t + jnp.asarray([0.5, 0.0, 0.0]))
    J = jax.jacfwd(
        lambda q: ft.residual((pose2_, ray5, q), {"uv": uv, "K": K})
    )(rho[None])
    assert np.abs(np.asarray(J)).max() > 1e-3


def test_smart_stereo_matches_explicit():
    """Smart stereo (HESSIAN mode) equals the explicit stereo graph with
    landmarks eliminated — same reduced camera system."""
    from gtsam_petercdev_tpu.slam import smart
    from gtsam_petercdev_tpu.geometry import cameras as cams

    rng = np.random.default_rng(3)
    Kst = jnp.asarray([500.0, 500.0, 0.0, 320.0, 240.0, 0.1])
    n_cams, n_pts = 4, 6
    poses = Pose3(
        jnp.broadcast_to(jnp.eye(3), (n_cams, 3, 3)).copy(),
        jnp.asarray(np.stack([np.linspace(0, 1.5, n_cams),
                              np.zeros(n_cams), np.zeros(n_cams)], 1)),
    )
    pts = rng.uniform(-1, 1, (n_pts, 3)) + np.array([0.5, 0, 6.0])
    tracks = []
    for j in range(n_pts):
        obs = []
        for c in range(n_cams):
            p1 = Pose3(poses.R[c], poses.t[c])
            z3, _ = cams.stereo_project(p1, jnp.asarray(pts[j]), Kst)
            obs.append((c, np.asarray(z3) + rng.normal(scale=0.1, size=3)))
        tracks.append(obs)
    batch = smart.from_tracks(tracks, Kst, stereo=True)
    gathered = jax.tree_util.tree_map(
        lambda a: a[jnp.asarray(batch.cam_rows)], poses
    )
    H, g, err = smart.assemble_camera_system(batch, gathered, n_cams)
    assert np.isfinite(np.asarray(H)).all()
    # one damped GN step on the reduced system decreases total error
    D = n_cams * 6
    x = np.linalg.solve(np.asarray(H) + 1e-6 * np.eye(D), np.asarray(g))
    from gtsam_petercdev_tpu.geometry import pose3 as p3mod

    new_poses = p3mod.retract(poses, jnp.asarray(x.reshape(n_cams, 6)))
    g_new = jax.tree_util.tree_map(
        lambda a: a[jnp.asarray(batch.cam_rows)], new_poses
    )
    e0 = float(smart.total_error(batch, gathered))
    e1 = float(smart.total_error(batch, g_new))
    assert e1 <= e0 + 1e-9
