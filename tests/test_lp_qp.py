"""Active-set LP/QP solvers (gtsam_unstable/linear/{QP,LP}Solver analogs)."""

import numpy as np

from gtsam_petercdev_tpu.constrained.qp import solve_lp, solve_qp


def test_qp_nocedal_16_4():
    """min (x1-1)^2 + (x2-2.5)^2 with 5 inequality constraints;
    known optimum (1.4, 1.7) (Nocedal & Wright ex. 16.4 — also the
    reference's QPSolver unit-test problem family)."""
    G = 2 * np.eye(2)
    g = np.array([-2.0, -5.0])
    CI = np.array([
        [1.0, -2.0],
        [-1.0, -2.0],
        [-1.0, 2.0],
        [1.0, 0.0],
        [0.0, 1.0],
    ])
    ci = np.array([-2.0, -6.0, -2.0, 0.0, 0.0])
    res = solve_qp(G, g, CI=CI, ci=ci)
    assert res.converged
    np.testing.assert_allclose(res.x, [1.4, 1.7], atol=1e-8)


def test_qp_equality_only():
    """min 0.5 x'x s.t. x1 + x2 = 2 -> x = (1, 1)."""
    res = solve_qp(np.eye(2), np.zeros(2), CE=np.array([[1.0, 1.0]]),
                   ce=np.array([2.0]))
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-10)


def test_qp_inactive_constraints():
    """Unconstrained optimum already feasible -> constraints inactive."""
    G = np.eye(2)
    g = np.array([-1.0, -1.0])  # optimum (1, 1)
    CI = np.array([[1.0, 0.0], [0.0, 1.0]])
    ci = np.array([0.0, 0.0])
    res = solve_qp(G, g, CI=CI, ci=ci)
    assert res.converged
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-9)
    assert res.active.size == 0


def test_lp_basic():
    """max x1 + x2 s.t. x1 + 2x2 <= 4, 4x1 + 2x2 <= 12, x >= 0
    -> optimum (8/3, 2/3) (classic LP; LPSolver test shape)."""
    c = np.array([-1.0, -1.0])  # minimize -x1-x2
    CI = np.array([
        [-1.0, -2.0],   # x1 + 2x2 <= 4
        [-4.0, -2.0],   # 4x1 + 2x2 <= 12
        [1.0, 0.0],
        [0.0, 1.0],
    ])
    ci = np.array([-4.0, -12.0, 0.0, 0.0])
    res = solve_lp(c, CI=CI, ci=ci)
    np.testing.assert_allclose(res.x, [8.0 / 3.0, 2.0 / 3.0], atol=1e-5)


def test_lp_with_equality():
    """min x1 s.t. x1 + x2 = 1, x >= 0 -> (0, 1)."""
    res = solve_lp(np.array([1.0, 0.0]), CE=np.array([[1.0, 1.0]]),
                   ce=np.array([1.0]), CI=np.eye(2), ci=np.zeros(2))
    np.testing.assert_allclose(res.x, [0.0, 1.0], atol=1e-5)
