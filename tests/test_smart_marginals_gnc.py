"""Smart projection factors, Marginals, and GNC robust optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import cal3, pose3, triangulation
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear import gnc, optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.marginals import Marginals
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam import smart
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _cube_scene(dtype=jnp.float64):
    """8 cameras on a circle viewing 8 cube corners (examples/SFMdata.h)."""
    points = np.array(
        [
            [10, 10, 10], [-10, 10, 10], [-10, -10, 10], [10, -10, 10],
            [10, 10, -10], [-10, 10, -10], [-10, -10, -10], [10, -10, -10],
        ],
        dtype=np.float64,
    )
    poses = []
    R_cam = 30.0
    for i in range(8):
        ang = 2 * np.pi * i / 8
        c = np.array([R_cam * np.cos(ang), 0.0, R_cam * np.sin(ang)])
        z = -c / np.linalg.norm(c)  # look at origin
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        poses.append(Pose3(jnp.asarray(R, dtype=dtype), jnp.asarray(c, dtype=dtype)))
    K = cal3.cal3_s2(50.0, 50.0, 0.0, 50.0, 50.0, dtype=dtype)
    return poses, points, K


def test_smart_factor_ba_converges():
    rng = np.random.default_rng(11)
    poses_gt, points, K = _cube_scene()

    tracks = []
    for j in range(points.shape[0]):
        obs = []
        for i, po in enumerate(poses_gt):
            q = np.asarray(pose3.transform_to(po, jnp.asarray(points[j])))
            if q[2] <= 0:
                continue
            pn = q[:2] / q[2]
            uv = np.asarray(cal3.cal3_s2_uncalibrate(K, jnp.asarray(pn)))
            obs.append((i, uv))
        tracks.append(obs)
    batch = smart.from_tracks(tracks, K)

    values = Values()
    for i, po in enumerate(poses_gt):
        eps = jnp.asarray(rng.normal(size=6) * 0.05)
        values.insert(i, "Pose3", pose3.retract(po, eps) if i >= 2 else po)

    graph = NonlinearFactorGraph()
    graph.add(prior_factor("Pose3"), [0], poses_gt[0], noise.isotropic(6, 1e-4, jnp.float64))
    graph.add(prior_factor("Pose3"), [1], poses_gt[1], noise.isotropic(6, 1e-4, jnp.float64))

    res = smart.smart_levenberg_marquardt(
        graph, batch, values, optimizers.LMParams(max_iterations=30)
    )
    assert res.error < 1e-6, res.error
    # recovered poses match ground truth
    final = res.values.params("Pose3")
    for i, po in enumerate(poses_gt):
        xi = np.asarray(pose3.local(pose3.index(final, i), po))
        assert np.linalg.norm(xi) < 1e-3, (i, xi)


def test_smart_degenerate_track_zero_weighted():
    poses_gt, points, K = _cube_scene()
    # a track seen by only ONE camera -> DEGENERATE -> zero contribution
    q = np.asarray(pose3.transform_to(poses_gt[0], jnp.asarray(points[0])))
    uv = np.asarray(cal3.cal3_s2_uncalibrate(K, jnp.asarray(q[:2] / q[2])))
    batch = smart.from_tracks([[(0, uv)]], K)
    poses = jax.tree_util.tree_map(
        lambda a: a[jnp.asarray(batch.cam_rows)], pose3.stack(poses_gt)
    )
    Hb, gb, _ = smart.schur_contributions(batch, poses)
    assert float(jnp.abs(Hb).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0


def _pose2_chain(n=5, sigma=0.1, dtype=jnp.float64):
    graph = NonlinearFactorGraph()
    values = Values()
    rng = np.random.default_rng(5)
    gt = [jnp.asarray([float(i), 0.0, 0.0], dtype=dtype) for i in range(n)]
    from gtsam_petercdev_tpu.geometry import pose2

    for i, p in enumerate(gt):
        eps = jnp.asarray(rng.normal(size=3) * 0.1, dtype=dtype)
        values.insert(i, "Pose2", pose2.retract(p, eps))
    graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, dtype))
    for i in range(n - 1):
        graph.add(
            between_factor("Pose2"), [i, i + 1],
            pose2.between(gt[i], gt[i + 1]), noise.isotropic(3, sigma, dtype),
        )
    return graph, values, gt


def test_marginals_match_dense_inverse():
    graph, values, _ = _pose2_chain()
    res = optimizers.gauss_newton(graph, values)
    marg = Marginals(graph, res.values)

    lg = graph.linearize(res.values)
    H, _ = linsolve.assemble_dense(lg)
    Sigma = np.linalg.inv(np.asarray(H) + 1e-10 * np.eye(H.shape[0]))

    for key in [0, 2, 4]:
        cov = np.asarray(marg.marginal_covariance(key))
        s = 3 * key
        np.testing.assert_allclose(cov, Sigma[s : s + 3, s : s + 3], rtol=1e-6, atol=1e-10)

    # covariance grows along the chain away from the prior
    c0 = np.trace(np.asarray(marg.marginal_covariance(0)))
    c4 = np.trace(np.asarray(marg.marginal_covariance(4)))
    assert c4 > c0

    joint = np.asarray(marg.joint_marginal_covariance([1, 3]))
    idx = np.r_[3:6, 9:12]
    np.testing.assert_allclose(joint, Sigma[np.ix_(idx, idx)], rtol=1e-6, atol=1e-10)

    b0, b4 = marg.batch_marginal_covariances([0, 4])
    np.testing.assert_allclose(np.asarray(b0), Sigma[0:3, 0:3], rtol=1e-6, atol=1e-10)


def test_gnc_rejects_outlier_loop_closure():
    from gtsam_petercdev_tpu.geometry import pose2

    graph, values, gt = _pose2_chain(n=6, sigma=0.05)
    # redundant (correct) skip connections so the single wrong closure is
    # uniquely inconsistent — with only a simple cycle, dropping ANY one
    # edge explains the data and GNC may reject an inlier instead
    from gtsam_petercdev_tpu.geometry import pose2 as _p2

    for i in range(4):
        graph.add(
            between_factor("Pose2"), [i, i + 2],
            _p2.between(gt[i], gt[i + 2]), noise.isotropic(3, 0.05, jnp.float64),
        )
    # add a WRONG loop closure between 0 and 5
    graph.add(
        between_factor("Pose2"), [0, 5],
        jnp.asarray([1.0, 3.0, 1.5], dtype=jnp.float64),
        noise.isotropic(3, 0.05, jnp.float64),
    )
    params = gnc.GncParams(loss_type="tls", verbose=False)
    result = gnc.gnc(graph, values, params)

    # find the batch holding the outlier factor (the last between batch row)
    outlier_w = None
    for i, b in enumerate(graph.batches):
        keys = b.keys
        for r in range(keys.shape[0]):
            if list(keys[r]) == [0, 5]:
                outlier_w = float(result.weights[i][r])
    assert outlier_w is not None and outlier_w < 0.5, outlier_w

    # solution close to ground truth despite the outlier
    final = result.values.params("Pose2")
    for i, p in enumerate(gt):
        d = np.asarray(pose2.local(final[i], p))
        assert np.linalg.norm(d) < 0.05, (i, d)


def test_chi_squared_quantile():
    # chi2(0.99, 3) ~ 11.345 (standard tables)
    q = gnc.chi_squared_quantile(3, 0.99)
    assert abs(q - 11.345) < 0.01, q
