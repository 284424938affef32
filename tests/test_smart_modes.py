"""Smart-factor linearization modes: IMPLICIT_SCHUR / JACOBIAN_Q / SVD / rig.

All modes must agree with the HESSIAN-mode Schur complement
(gtsam/slam/RegularImplicitSchurFactor.h:39, JacobianFactorQ.h,
JacobianFactorSVD.h, SmartProjectionRigFactor.h:49).
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import cal3, pose3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.slam import smart


def _cube_scene(dtype=jnp.float64):
    points = np.array(
        [
            [10, 10, 10], [-10, 10, 10], [-10, -10, 10], [10, -10, 10],
            [10, 10, -10], [-10, 10, -10], [-10, -10, -10], [10, -10, -10],
        ],
        dtype=np.float64,
    )
    poses = []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        c = np.array([30.0 * np.cos(ang), 0.0, 30.0 * np.sin(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0.0, 1.0, 0.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        poses.append(Pose3(jnp.asarray(R, dtype=dtype), jnp.asarray(c, dtype=dtype)))
    K = cal3.cal3_s2(50.0, 50.0, 0.0, 50.0, 50.0, dtype=dtype)
    return poses, points, K


def _make_batch(noise_scale=0.0, seed=0, rig=False):
    rng = np.random.default_rng(seed)
    poses_gt, points, K = _cube_scene()
    if rig:
        K2 = cal3.cal3_s2(60.0, 60.0, 0.0, 48.0, 52.0, dtype=jnp.float64)
        cal_bank = jnp.stack([jnp.asarray(K), jnp.asarray(K2)])
        cal_of_cam = {i: i % 2 for i in range(8)}
    else:
        cal_bank = jnp.asarray(K)
        cal_of_cam = None
    tracks = []
    for j in range(points.shape[0]):
        obs = []
        for i, po in enumerate(poses_gt):
            q = np.asarray(pose3.transform_to(po, jnp.asarray(points[j])))
            if q[2] <= 0:
                continue
            pn = q[:2] / q[2]
            Ki = cal_bank if not rig else cal_bank[cal_of_cam[i]]
            uv = np.asarray(cal3.cal3_s2_uncalibrate(jnp.asarray(Ki), jnp.asarray(pn)))
            uv = uv + rng.normal(size=2) * noise_scale
            obs.append((i, uv))
        tracks.append(obs)
    batch = smart.from_tracks(tracks, cal_bank, cal_of_cam=cal_of_cam)
    # perturbed poses (the linearization point)
    import jax

    poses_np = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *poses_gt
    )
    gathered = jax.tree_util.tree_map(
        lambda a: a[jnp.asarray(batch.cam_rows)], poses_np
    )
    return batch, gathered


def _dense_from_blocks(batch, poses, n_cams=8):
    H, g, _ = smart.assemble_camera_system(batch, poses, n_cams)
    return np.asarray(H), np.asarray(g)


def test_implicit_schur_matches_hessian():
    batch, poses = _make_batch(noise_scale=0.5)
    H, g = _dense_from_blocks(batch, poses)
    terms = smart.implicit_schur_terms(batch, poses)
    rng = np.random.default_rng(1)
    for _ in range(3):
        v = rng.standard_normal((8, 6))
        y = np.asarray(
            smart.implicit_schur_hvp(terms, batch.cam_rows, jnp.asarray(v), 8)
        ).reshape(-1)
        np.testing.assert_allclose(y, H @ v.reshape(-1), atol=1e-8)
    g2 = np.asarray(
        smart.implicit_schur_gradient(terms, batch.cam_rows, 8)
    ).reshape(-1)
    np.testing.assert_allclose(g2, g, atol=1e-8)


def test_block_diag_matches_hessian_diagonal():
    batch, poses = _make_batch(noise_scale=0.5)
    H, _ = _dense_from_blocks(batch, poses)
    terms = smart.implicit_schur_terms(batch, poses)
    blocks = np.asarray(smart.implicit_schur_block_diag(terms, batch.cam_rows, 8))
    for c in range(8):
        np.testing.assert_allclose(
            blocks[c], H[c * 6 : c * 6 + 6, c * 6 : c * 6 + 6], atol=1e-8
        )


def test_jacobian_q_reproduces_hessian():
    batch, poses = _make_batch(noise_scale=0.5)
    H, g = _dense_from_blocks(batch, poses)
    A, b = smart.jacobian_q_factors(batch, poses)
    T, R = A.shape[0], A.shape[1]
    Af = np.asarray(A).reshape(T, R, batch.max_views * 6)
    bf = np.asarray(b)
    # scatter view blocks into global columns
    Hq = np.zeros_like(H)
    gq = np.zeros_like(g)
    for t in range(T):
        cols = np.concatenate(
            [batch.cam_rows[t, m] * 6 + np.arange(6) for m in range(batch.max_views)]
        )
        At = Af[t]
        # Q is a projector (Q^T Q = Q): A^T A double-applies it, so compare
        # via the projected rows directly
        Hq[np.ix_(cols, cols)] += At.T @ At
        gq[cols] += At.T @ bf[t]
    np.testing.assert_allclose(Hq, H, atol=1e-7)
    np.testing.assert_allclose(gq, g, atol=1e-7)


def test_jacobian_svd_reproduces_hessian():
    batch, poses = _make_batch(noise_scale=0.5)
    H, g = _dense_from_blocks(batch, poses)
    A, b = smart.jacobian_svd_factors(batch, poses)
    T, R = A.shape[0], A.shape[1]
    Af = np.asarray(A).reshape(T, R, batch.max_views * 6)
    bf = np.asarray(b)
    Hs = np.zeros_like(H)
    gs = np.zeros_like(g)
    for t in range(T):
        cols = np.concatenate(
            [batch.cam_rows[t, m] * 6 + np.arange(6) for m in range(batch.max_views)]
        )
        Hs[np.ix_(cols, cols)] += Af[t].T @ Af[t]
        gs[cols] += Af[t].T @ bf[t]
    np.testing.assert_allclose(Hs, H, atol=1e-7)
    np.testing.assert_allclose(gs, g, atol=1e-7)


def test_smart_pcg_matches_dense_solve():
    batch, poses = _make_batch(noise_scale=0.5)
    H, g = _dense_from_blocks(batch, poses)
    lam = 1e-3
    x_pcg = np.asarray(smart.smart_pcg(batch, poses, 8, lam=lam)).reshape(-1)
    x_dense = np.linalg.solve(H + lam * np.eye(48), g)
    np.testing.assert_allclose(x_pcg, x_dense, atol=1e-6)


def test_rig_per_camera_calibration():
    """Two-calibration rig: exact measurements -> zero residual at truth."""
    batch, poses = _make_batch(noise_scale=0.0, rig=True)
    err = float(smart.total_error(batch, poses))
    assert err < 1e-14, err
    # and the hvp still matches the dense assembly
    H, g = _dense_from_blocks(batch, poses)
    np.testing.assert_allclose(g, 0.0, atol=1e-10)
