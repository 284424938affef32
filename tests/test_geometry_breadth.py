"""Breadth geometry: fisheye/unified/stereo cals, spherical camera,
fundamental matrix, Sim2, SO(n), sampler, DSF track generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import cal3, extra, pose3, so3, unit3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import sampler
from gtsam_petercdev_tpu.sfm import tracks as trackgen


def test_fisheye_roundtrip():
    k = cal3.cal3_fisheye(300.0, 310.0, 0.5, 320.0, 240.0,
                          -0.02, 0.005, -0.001, 0.0003, dtype=jnp.float64)
    pts = jnp.asarray([[0.1, -0.2], [0.4, 0.3], [0.0, 0.0], [0.9, -0.8]],
                      dtype=jnp.float64)
    for p in pts:
        uv = cal3.cal3_fisheye_uncalibrate(k, p)
        back = cal3.cal3_fisheye_calibrate(k, uv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-9)


def test_fisheye_center_is_principal_point():
    k = cal3.cal3_fisheye(300.0, 310.0, 0.0, 320.0, 240.0, dtype=jnp.float64)
    uv = cal3.cal3_fisheye_uncalibrate(k, jnp.zeros(2, dtype=jnp.float64))
    np.testing.assert_allclose(np.asarray(uv), [320.0, 240.0], atol=1e-12)


def test_unified_roundtrip_and_ds2_degeneracy():
    k = cal3.cal3_unified(400.0, 410.0, 0.1, 320.0, 240.0,
                          -0.01, 0.002, 1e-4, -2e-4, 0.3, dtype=jnp.float64)
    p = jnp.asarray([0.2, -0.1], dtype=jnp.float64)
    uv = cal3.cal3_unified_uncalibrate(k, p)
    back = cal3.cal3_unified_calibrate(k, uv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-8)

    # xi = 0 must reduce exactly to Cal3DS2
    k0 = cal3.cal3_unified(400.0, 410.0, 0.1, 320.0, 240.0,
                           -0.01, 0.002, 1e-4, -2e-4, 0.0, dtype=jnp.float64)
    uv0 = cal3.cal3_unified_uncalibrate(k0, p)
    uv_ds2 = cal3.cal3_ds2_uncalibrate(k0[:9], p)
    np.testing.assert_allclose(np.asarray(uv0), np.asarray(uv_ds2), atol=1e-12)


def test_stereo_calibration():
    k = cal3.cal3_s2_stereo(500.0, 500.0, 0.0, 320.0, 240.0, 0.1,
                            dtype=jnp.float64)
    # point at z=2: x=0.5, y=0.25 normalized, inv_depth = 0.5
    p = jnp.asarray([0.5, 0.25, 0.5], dtype=jnp.float64)
    uLuRv = cal3.stereo_uncalibrate(k, p)
    uL, uR, v = np.asarray(uLuRv)
    assert abs((uL - uR) - 500.0 * 0.1 * 0.5) < 1e-12  # disparity = fx b / z
    assert abs(v - (500.0 * 0.25 + 240.0)) < 1e-12


def test_spherical_camera():
    pose = pose3.expmap(jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0],
                                    dtype=jnp.float64))
    point = jnp.asarray([2.0, -1.0, 4.0], dtype=jnp.float64)
    b = extra.spherical_project(pose, point)
    np.testing.assert_allclose(float(jnp.linalg.norm(b)), 1.0, atol=1e-12)
    depth = float(jnp.linalg.norm(np.asarray(pose3.transform_to(pose, point))))
    back = extra.spherical_backproject(pose, b, depth)
    np.testing.assert_allclose(np.asarray(back), np.asarray(point), atol=1e-9)
    err = extra.spherical_reprojection_error(pose, point, b)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-12)


def test_fundamental_matrix_epipolar():
    rng = np.random.default_rng(3)
    # two cameras with known relative geometry
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    R = np.asarray(so3.expmap(jnp.asarray([0.05, -0.1, 0.02])))
    t = np.array([1.0, 0.2, -0.1])
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.asarray(extra.fundamental_from_essential(
        jnp.asarray(K), jnp.asarray(E), jnp.asarray(K)))
    # generate correspondences: X in cam1 frame, cam2 = R X + t... use the
    # epipolar identity x2^T E x1 = 0 with x2 = R x1 + t rays
    for _ in range(5):
        X = rng.standard_normal(3) * 2 + np.array([0, 0, 6.0])
        x1 = X / X[2]
        X2 = R @ X + t
        x2 = X2 / X2[2]
        p1 = (K @ x1)[:2]
        p2 = (K @ x2)[:2]
        e = float(extra.epipolar_error(jnp.asarray(F), jnp.asarray(p1),
                                       jnp.asarray(p2)))
        # algebraic epipolar constraint holds up to scale-free roundoff
        assert abs(e) < 1e-6, e

    # params <-> matrix roundtrip (up to scale)
    U, s, V = extra.fundamental_params(jnp.asarray(F))
    F2 = np.asarray(extra.fundamental_matrix(U, s, V))
    Fn = F / np.linalg.norm(F)
    F2n = F2 / np.linalg.norm(F2)
    err = min(np.abs(F2n - Fn).max(), np.abs(F2n + Fn).max())
    assert err < 1e-8, err


def test_sim2_group_ops():
    g = extra.sim2(0.4, [1.0, -2.0], 1.5)
    h = extra.sim2(-0.2, [0.3, 0.7], 0.8)
    p = jnp.asarray([2.0, 3.0], dtype=jnp.float64)
    lhs = extra.sim2_transform_from(extra.sim2_compose(g, h), p)
    rhs = extra.sim2_transform_from(g, extra.sim2_transform_from(h, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)
    ginv = extra.sim2_inverse(g)
    back = extra.sim2_transform_from(ginv, extra.sim2_transform_from(g, p))
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-12)


@pytest.mark.parametrize("n", [4, 5])
def test_son_exp_log_roundtrip(n):
    rng = np.random.default_rng(n)
    xi = jnp.asarray(rng.standard_normal(extra.son_dim(n)) * 0.3)
    R = extra.son_expmap(xi, n)
    # orthogonality
    np.testing.assert_allclose(
        np.asarray(R.T @ R), np.eye(n), atol=1e-10
    )
    xi_back = extra.son_logmap(R, n)
    np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-6)
    # hat/vee roundtrip
    X = extra.son_hat(xi, n)
    np.testing.assert_allclose(
        np.asarray(extra.son_vee(X, n)), np.asarray(xi), atol=1e-12
    )


def test_son_hat_reference_parity():
    """Hard-coded SOn::Hat matrices from the reference's testSOn.cpp HatVee
    (xi = 1..10): the tangent-vector convention must be interchangeable."""
    v = jnp.arange(1.0, 11.0)
    exp3 = np.array([[0, -3, 2], [3, 0, -1], [-2, 1, 0]], dtype=float)
    np.testing.assert_allclose(np.asarray(extra.son_hat(v[:3], 3)), exp3)
    exp4 = np.array(
        [[0, -6, 5, 3], [6, 0, -4, -2], [-5, 4, 0, 1], [-3, 2, -1, 0]],
        dtype=float,
    )
    np.testing.assert_allclose(np.asarray(extra.son_hat(v[:6], 4)), exp4)
    exp5 = np.array(
        [
            [0, -10, 9, 7, -4],
            [10, 0, -8, -6, 3],
            [-9, 8, 0, 5, -2],
            [-7, 6, -5, 0, 1],
            [4, -3, 2, -1, 0],
        ],
        dtype=float,
    )
    np.testing.assert_allclose(np.asarray(extra.son_hat(v, 5)), exp5)
    np.testing.assert_allclose(np.asarray(extra.son_vee(jnp.asarray(exp5), 5)), np.asarray(v))


def test_sampler_covariance():
    key = jax.random.PRNGKey(0)
    sig = jnp.asarray([0.5, 2.0, 1.0], dtype=jnp.float64)
    eps = sampler.sample_diagonal(key, sig, shape=(20000,))
    cov = np.cov(np.asarray(eps).T)
    np.testing.assert_allclose(np.diag(cov), np.asarray(sig) ** 2, rtol=0.1)

    R = jnp.asarray([[2.0, 0.5, 0], [0, 1.0, -0.3], [0, 0, 4.0]],
                    dtype=jnp.float64)
    eps2 = sampler.sample_sqrt_info(key, R, shape=(40000,))
    cov2 = np.cov(np.asarray(eps2).T)
    Sigma = np.linalg.inv(np.asarray(R).T @ np.asarray(R))
    np.testing.assert_allclose(cov2, Sigma, atol=0.05 * np.abs(Sigma).max() + 0.005)


def test_dsf_track_generator():
    kp = [np.random.rand(4, 2) for _ in range(3)]
    matches = {
        (0, 1): np.array([[0, 1], [2, 3]]),  # two clean 2-view tracks
        (1, 2): np.array([[1, 0]]),          # extends track 0 to 3 views
        (0, 2): np.array([[1, 2], [3, 2]]),  # kp 2 of img2 matched TWICE
    }
    tr = trackgen.tracks_from_pairwise_matches(kp, matches)
    sizes = sorted(t.n_measurements for t in tr)
    # the (0,2)-double-match component has two img-0 keypoints -> dropped
    assert sizes == [2, 3], sizes
