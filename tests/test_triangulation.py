"""Triangulation: DLT / LOST / nonlinear / triangulateSafe status codes.

Mirrors gtsam/geometry/tests/testTriangulation.cpp: known-point recovery from
synthetic views, cheirality and degeneracy statuses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import pose3, so3, triangulation
from gtsam_petercdev_tpu.geometry.pose3 import Pose3


def _make_views(point, n=4, radius=5.0, noise=0.0, rng=None):
    """Cameras on an arc looking at the origin-ish region."""
    poses = []
    meas = []
    for i in range(n):
        ang = 0.3 * i
        c = np.array([radius * np.sin(ang), 0.5 * i, -radius * np.cos(ang)])
        # camera z-axis toward the point
        z = point - c
        z = z / np.linalg.norm(z)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        pose = Pose3(jnp.asarray(R), jnp.asarray(c))
        q = np.asarray(pose3.transform_to(pose, jnp.asarray(point)))
        pn = q[:2] / q[2]
        if noise and rng is not None:
            pn = pn + rng.normal(size=2) * noise
        poses.append(pose)
        meas.append(pn)
    return pose3.stack(poses), jnp.asarray(np.stack(meas))


def test_dlt_exact():
    p_true = np.array([0.2, -0.1, 1.0])
    poses, meas = _make_views(p_true)
    p, sv = triangulation.triangulate_dlt(poses, meas)
    np.testing.assert_allclose(np.asarray(p), p_true, atol=1e-6)


def test_lost_exact():
    p_true = np.array([0.2, -0.1, 1.0])
    poses, meas = _make_views(p_true)
    p = triangulation.triangulate_lost(poses, meas)
    np.testing.assert_allclose(np.asarray(p), p_true, atol=1e-6)


def test_nonlinear_refine_under_noise(rng):
    p_true = np.array([0.3, 0.1, 0.5])
    poses, meas = _make_views(p_true, n=6, noise=1e-3, rng=rng)
    p0, _ = triangulation.triangulate_dlt(poses, meas)
    p = triangulation.triangulate_nonlinear(poses, meas, p0)
    # refinement should not move far and should reduce reprojection error
    def reproj_err(pt):
        q = pose3.transform_to(poses, jnp.broadcast_to(pt, (6, 3)))
        pn = q[..., :2] / q[..., 2:3]
        return float(jnp.sum((pn - meas) ** 2))

    assert reproj_err(p) <= reproj_err(p0) + 1e-12
    np.testing.assert_allclose(np.asarray(p), p_true, atol=5e-2)


def test_safe_valid():
    p_true = np.array([0.0, 0.0, 0.8])
    poses, meas = _make_views(p_true)
    res = triangulation.triangulate_safe(poses, meas)
    assert int(res.status) == triangulation.VALID
    np.testing.assert_allclose(np.asarray(res.point), p_true, atol=1e-5)


def test_safe_behind_camera():
    # Fabricate measurements of a point behind every camera: project a
    # valid point, then flip the camera orientations 180 deg about x.
    p_true = np.array([0.0, 0.0, 0.8])
    poses, meas = _make_views(p_true)
    flip = jnp.asarray(np.diag([1.0, -1.0, -1.0]))
    poses_flipped = Pose3(poses.R @ flip, poses.t)
    res = triangulation.triangulate_safe(poses_flipped, meas)
    assert int(res.status) != triangulation.VALID


def test_safe_too_few_views():
    p_true = np.array([0.0, 0.0, 0.8])
    poses, meas = _make_views(p_true, n=3)
    mask = jnp.asarray([True, False, False])
    res = triangulation.triangulate_safe(poses, meas, mask)
    assert int(res.status) == triangulation.DEGENERATE


def test_safe_outlier_rejection():
    p_true = np.array([0.0, 0.0, 0.8])
    poses, meas = _make_views(p_true, n=4)
    meas = meas.at[2].add(jnp.asarray([0.05, 0.05]))  # outlier view
    params = triangulation.TriangulationParameters(
        dynamic_outlier_rejection_threshold=0.01
    )
    res = triangulation.triangulate_safe(poses, meas, params=params)
    assert int(res.status) == triangulation.OUTLIER


def test_batch_vmap():
    rng = np.random.default_rng(3)
    T = 16
    pts = rng.normal(size=(T, 3)) * 0.3 + np.array([0, 0, 1.0])
    all_poses, all_meas = [], []
    for j in range(T):
        po, me = _make_views(pts[j], n=4)
        all_poses.append(po)
        all_meas.append(me)
    poses_b = Pose3(
        jnp.stack([p.R for p in all_poses]), jnp.stack([p.t for p in all_poses])
    )
    meas_b = jnp.stack(all_meas)
    mask = jnp.ones((T, 4), dtype=bool)
    res = triangulation.triangulate_batch(poses_b, meas_b, mask)
    assert np.all(np.asarray(res.status) == triangulation.VALID)
    np.testing.assert_allclose(np.asarray(res.point), pts, atol=1e-4)
