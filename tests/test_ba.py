"""Bundle adjustment tests: BAL I/O, projection Jacobians, LM convergence.

Mirrors reference SFMExample_bal.cpp and gtsam/geometry/tests camera tests;
the Jacobian oracle is jax.jacfwd (replacing numericalDerivative).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import cal3, cameras, pose3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.models.bundle_adjustment import (
    C,
    P,
    build_ba_graph,
    optimize_ba,
)
from gtsam_petercdev_tpu.nonlinear.optimizers import LMParams
from gtsam_petercdev_tpu.sfm.bal import read_bal

BAL_FILE = "/root/reference/examples/Data/dubrovnik-3-7-pre.txt"


def test_read_bal():
    data = read_bal(BAL_FILE)
    assert data.n_cameras == 3
    assert data.n_tracks == 7
    for tr in data.tracks:
        assert tr.uv.shape[0] == len(tr.cam_idx)


def test_initial_projection_errors_small():
    """BAL 'pre' files are near-optimal: reprojection residuals are modest
    and all points are in front of the cameras (validates the OpenGL->gtsam
    conversion and the Cal3Bundler model end-to-end)."""
    data = read_bal(BAL_FILE)
    max_r = 0.0
    for j, tr in enumerate(data.tracks):
        for m, ci in enumerate(tr.cam_idx):
            cam = data.cameras[int(ci)]
            uv, depth = cameras.project_bundler(
                Pose3(cam.R, cam.t), jnp.asarray(tr.point), cam.cal
            )
            assert float(depth) > 0
            max_r = max(max_r, float(jnp.linalg.norm(uv - jnp.asarray(tr.uv[m]))))
    # pixels; 'pre' = perturbed-but-sane initialization (initial graph error
    # 2764.22 matches the reference exactly, so 38px max residual is the data)
    assert max_r < 60.0


def test_cal3_roundtrips(rng):
    k_s2 = cal3.cal3_s2(500.0, 480.0, 0.1, 320.0, 240.0, jnp.float64)
    p = jnp.asarray(rng.normal(size=(10, 2)) * 0.3)
    pi = cal3.cal3_s2_uncalibrate(k_s2, p)
    np.testing.assert_allclose(
        np.asarray(cal3.cal3_s2_calibrate(k_s2, pi)), np.asarray(p), atol=1e-12
    )
    k_b = cal3.cal3_bundler(500.0, 1e-2, 1e-3, jnp.float64)
    pi = cal3.cal3_bundler_uncalibrate(k_b, p)
    back = cal3.cal3_bundler_calibrate(k_b, pi, iterations=30)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-9)


def test_projection_jacobian_vs_numeric(rng):
    """Analytic-free: jacfwd of project must match finite differences."""
    cam_pose = pose3.expmap(jnp.asarray(rng.normal(size=6) * 0.2))
    point = jnp.asarray([0.3, -0.2, 4.0])
    cal = cal3.cal3_bundler(400.0, -1e-2, 2e-3, jnp.float64)

    def f(xi):
        uv, _ = cameras.project_bundler(pose3.retract(cam_pose, xi), point, cal)
        return uv

    J = jax.jacfwd(f)(jnp.zeros(6))
    eps = 1e-7
    J_num = np.zeros((2, 6))
    for i in range(6):
        e = np.zeros(6)
        e[i] = eps
        J_num[:, i] = (np.asarray(f(jnp.asarray(e))) - np.asarray(f(jnp.asarray(-e)))) / (
            2 * eps
        )
    np.testing.assert_allclose(np.asarray(J), J_num, atol=1e-5)


def test_ba_converges():
    data = read_bal(BAL_FILE)
    graph, values = build_ba_graph(data)
    e0 = float(graph.error(values))
    res = optimize_ba(data, LMParams(max_iterations=40))
    # reference reaches 0.0461 after 100 iterations (SFMExample_bal);
    # 40 iterations gets within the same basin
    assert res.error < 0.1
    assert res.error < e0 * 1e-4


def test_schur_solver_matches_dense():
    """Landmark-eliminated Schur solve == full dense solve (same damped
    normal equations) — the CameraSet::SchurComplement equivalence."""
    from gtsam_petercdev_tpu.linear import solve as linsolve
    from gtsam_petercdev_tpu.sfm import schur

    data = read_bal(BAL_FILE)
    graph, values = build_ba_graph(data)
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    for lam, dd in ((1e-3, False), (0.5, True)):
        x = linsolve.dense_solve(H, g, lam, diagonal_damping=dd)
        want = linsolve.unflatten_delta(lg, x)
        plan = schur.build_schur_plan(lg)
        rows_static = tuple(tuple(np.asarray(r) for r in lb.rows) for lb in lg.batches)
        Ab = tuple((lb.A, lb.b) for lb in lg.batches)
        got = schur.schur_solve(plan, rows_static, Ab, lam, diagonal_damping=dd)
        for t in want:
            np.testing.assert_allclose(
                np.asarray(got[t]), np.asarray(want[t]), atol=1e-7
            )


def test_lm_with_schur_solver():
    data = read_bal(BAL_FILE)
    graph, values = build_ba_graph(data)
    from gtsam_petercdev_tpu.nonlinear.optimizers import levenberg_marquardt

    res = levenberg_marquardt(graph, values, LMParams(max_iterations=25, solver="schur"))
    assert res.error < 0.5
