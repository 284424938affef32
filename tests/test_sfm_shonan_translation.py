"""Shonan averaging, MFAS, and translation recovery."""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.sfm import shonan, translation


def _ring_measurements(N=10, noise_sigma=0.0, seed=0):
    rng = np.random.default_rng(seed)
    R_gt = so3.expmap(jnp.asarray(rng.normal(size=(N, 3)) * 0.8))
    iis, jjs, Rs = [], [], []
    for a in range(N):
        for b in range(a + 1, min(a + 4, N)):
            iis.append(a)
            jjs.append(b)
            Rij = so3.between(R_gt[a], R_gt[b])
            if noise_sigma > 0:
                Rij = so3.compose(
                    Rij, so3.expmap(jnp.asarray(rng.normal(size=3) * noise_sigma))
                )
            Rs.append(np.asarray(Rij))
    m = shonan.ShonanMeasurements(
        np.array(iis), np.array(jjs), jnp.asarray(np.stack(Rs)), jnp.ones(len(iis))
    )
    return m, R_gt


def _max_rot_err(R_est, R_gt):
    R0 = np.asarray(R_gt[0])
    gt_fixed = np.einsum("ij,njk->nik", R0.T, np.asarray(R_gt))
    return max(
        np.linalg.norm(
            np.asarray(so3.logmap(jnp.asarray(gt_fixed[i].T @ np.asarray(R_est[i]))))
        )
        for i in range(len(gt_fixed))
    )


def test_shonan_exact_certified_at_p3():
    m, R_gt = _ring_measurements()
    res = shonan.shonan_averaging(m, p_min=3, p_max=5, seed=1)
    assert res.certified
    assert res.min_eigenvalue > -1e-4
    assert _max_rot_err(res.rotations, R_gt) < 1e-5


def test_shonan_noisy_certified_with_lift():
    m, R_gt = _ring_measurements(noise_sigma=0.05, seed=3)
    res = shonan.shonan_averaging(m, p_min=4, p_max=6, seed=2)
    assert res.certified
    assert _max_rot_err(res.rotations, R_gt) < 0.2


def test_mfas_ordering_respects_chain():
    # chain 0 -> 1 -> 2 -> 3 with consistent weights
    edges = [(0, 1), (1, 2), (2, 3), (0, 2)]
    w = [1.0, 1.0, 1.0, 1.0]
    order = translation.mfas_ordering(edges, w)
    pos = {n: i for i, n in enumerate(order)}
    assert pos[0] < pos[1] < pos[2] < pos[3]


def test_mfas_outlier_weights_flag_reversed_edge():
    rng = np.random.default_rng(0)
    t_gt = np.array([[0, 0, 0], [1, 0, 0], [2, 0.5, 0], [3, 0, 1]], float)
    edges, dirs = [], []
    for i in range(4):
        for j in range(i + 1, 4):
            d = t_gt[j] - t_gt[i]
            edges.append((i, j))
            dirs.append(d / np.linalg.norm(d))
    # corrupt one edge: reverse its direction
    dirs[1] = -dirs[1]
    w = translation.mfas_outlier_weights(edges, np.asarray(dirs))
    assert np.argmax(w) == 1, w


def test_translation_recovery():
    t_gt = np.array(
        [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 1], [1, 1, 2]], float
    )
    edges, dirs = [], []
    for i in range(5):
        for j in range(i + 1, 5):
            d = t_gt[j] - t_gt[i]
            edges.append((i, j))
            dirs.append(d / np.linalg.norm(d))
    vals = translation.recover_translations(edges, np.asarray(dirs), scale_anchor=2.0)
    # gauge: node0 at origin, first edge length 2 == ground truth scale
    est = np.stack([np.asarray(vals.at(n)) for n in range(5)])
    np.testing.assert_allclose(est, t_gt, atol=1e-4)
