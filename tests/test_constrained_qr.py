"""Exact sigma==0 constrained elimination (linear/qr.py) vs the mu-penalty.

Mirrors the reference's Constrained-noise QR semantics
(gtsam/linear/NoiseModel.cpp:503, JacobianFactor.cpp:804): constrained rows
must be satisfied EXACTLY by the solve, not to 1/mu^2.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise, qr as linqr, solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import (
    LMParams,
    OptimizerParams,
    gauss_newton,
    levenberg_marquardt,
)
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _constrained_toy():
    """3-pose chain; pose 0 pinned EXACTLY (NonlinearEquality semantics)."""
    graph = NonlinearFactorGraph()
    eq_sqrt, eq_mask = noise.constrained_all(3)
    odo_sqrt = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    anchor = jnp.array([1.0, 2.0, 0.3])
    graph.add(
        prior_factor("Pose2"), [0], anchor, eq_sqrt, constrained_mask=eq_mask
    )
    graph.add(
        between_factor("Pose2"), [0, 1], jnp.array([2.0, 0.0, 0.0]), odo_sqrt
    )
    graph.add(
        between_factor("Pose2"), [1, 2], jnp.array([2.0, 0.0, np.pi / 2]), odo_sqrt
    )
    values = Values()
    values.insert(0, "Pose2", jnp.array([0.5, 1.0, 0.2]))
    values.insert(1, "Pose2", jnp.array([2.3, 0.1, -0.2]))
    values.insert(2, "Pose2", jnp.array([4.1, 0.1, np.pi / 2 + 0.1]))
    return graph, values, np.asarray(anchor)


def test_lse_matches_kkt_oracle(rng):
    """Nullspace LSE == direct KKT solve on a random dense problem."""
    D, m, nc = 9, 30, 4
    A = rng.standard_normal((m, D))
    b = rng.standard_normal(m)
    C = rng.standard_normal((nc, D))
    d = rng.standard_normal(nc)
    H, g = A.T @ A, A.T @ b
    x, _ = linqr.solve_lse(
        jnp.asarray(H), jnp.asarray(g), jnp.asarray(C), jnp.asarray(d)
    )
    # KKT oracle: [[H C^T],[C 0]] [x; nu] = [g; d]
    KKT = np.block([[H, C.T], [C, np.zeros((nc, nc))]])
    rhs = np.concatenate([g, d])
    x_ref = np.linalg.solve(KKT, rhs)[:D]
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)
    np.testing.assert_allclose(C @ np.asarray(x), d, atol=1e-10)


def test_constraint_exact_vs_penalty():
    """sigma==0 pin holds to ~1e-12 with the exact path (penalty: ~1e-8)."""
    graph, values, anchor = _constrained_toy()
    res = gauss_newton(graph, values, OptimizerParams(solver="dense"))
    p0 = np.asarray(res.values.at(0))
    np.testing.assert_allclose(p0, anchor, atol=1e-10)

    # penalty version of the same problem leaves a visible gap
    graph_p = NonlinearFactorGraph()
    pen_sqrt = noise.diagonal_sigmas(jnp.array([0.0, 0.0, 0.0]))  # mu=1e4
    odo_sqrt = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    graph_p.add(prior_factor("Pose2"), [0], jnp.asarray(anchor), pen_sqrt)
    graph_p.add(
        between_factor("Pose2"), [0, 1], jnp.array([2.0, 0.0, 0.0]), odo_sqrt
    )
    graph_p.add(
        between_factor("Pose2"), [1, 2], jnp.array([2.0, 0.0, np.pi / 2]), odo_sqrt
    )
    v2 = Values()
    for i, x in [(0, [0.5, 1.0, 0.2]), (1, [2.3, 0.1, -0.2]), (2, [4.1, 0.1, 1.67])]:
        v2.insert(i, "Pose2", jnp.asarray(x))
    res_p = gauss_newton(graph_p, v2, OptimizerParams(solver="dense"))
    # both agree on the free poses
    np.testing.assert_allclose(
        np.asarray(res.values.at(1)),
        np.asarray(res_p.values.at(1)),
        atol=1e-5,
    )


def test_constrained_lm():
    """LM with the exact path converges and keeps the pin exact."""
    graph, values, anchor = _constrained_toy()
    res = levenberg_marquardt(graph, values, LMParams(solver="dense"))
    assert res.converged
    np.testing.assert_allclose(
        np.asarray(res.values.at(0)), anchor, atol=1e-9
    )


def test_partial_row_constraint():
    """constrained_sigmas: only the sigma==0 rows are exact."""
    sqrt_info, mask = noise.constrained_sigmas(np.array([0.0, 0.5, 0.1]))
    assert mask.tolist() == [True, False, False]
    np.testing.assert_allclose(sqrt_info[0, 0], 1.0)
    np.testing.assert_allclose(sqrt_info[1, 1], 2.0)

    graph = NonlinearFactorGraph()
    anchor = jnp.array([1.0, 2.0, 0.3])
    graph.add(
        prior_factor("Pose2"), [0], anchor, sqrt_info, constrained_mask=mask
    )
    odo_sqrt = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    graph.add(
        between_factor("Pose2"), [0, 1], jnp.array([2.0, 0.0, 0.0]), odo_sqrt
    )
    # pull pose0 away via a soft prior; x-component must stay anchored
    soft = noise.diagonal_sigmas(jnp.array([0.1, 0.1, 0.1]))
    graph.add(prior_factor("Pose2"), [0], jnp.array([5.0, 5.0, 1.0]), soft)
    values = Values()
    values.insert(0, "Pose2", jnp.array([0.9, 1.9, 0.25]))
    values.insert(1, "Pose2", jnp.array([3.0, 2.0, 0.3]))
    res = gauss_newton(graph, values, OptimizerParams(solver="dense"))
    p0 = np.asarray(res.values.at(0))
    # prior_factor residual is Local(anchor, x); row 0 exact => x matches in
    # the first tangent coordinate; soft rows move the others
    assert abs(p0[0] - 1.0) < 1e-6 or abs(p0[1] - 2.0) > 1e-3


def test_qr_solve_rank_deficient(rng):
    """qr_solve returns the minimum-norm solution on a singular system."""
    A = rng.standard_normal((6, 4))
    A[:, 3] = A[:, 0]  # exact rank deficiency
    x_true = rng.standard_normal(4)
    b = A @ x_true
    x = np.asarray(linqr.qr_solve(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(A @ x, b, atol=1e-9)  # consistent
    xn = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(x, xn, atol=1e-8)  # min-norm


def test_nonlinear_equality_helper():
    from gtsam_petercdev_tpu.slam.factors import nonlinear_equality

    ft, sq, mask = nonlinear_equality("Pose2")
    graph = NonlinearFactorGraph()
    anchor = jnp.array([0.7, -0.3, 0.2])
    graph.add(ft, [0], anchor, sq, constrained_mask=mask)
    odo = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    graph.add(between_factor("Pose2"), [0, 1], jnp.array([1.0, 0.0, 0.0]), odo)
    v = Values()
    v.insert(0, "Pose2", jnp.array([0.5, 0.0, 0.0]))
    v.insert(1, "Pose2", jnp.array([1.5, 0.0, 0.0]))
    res = gauss_newton(graph, v, OptimizerParams(solver="dense"))
    np.testing.assert_allclose(np.asarray(res.values.at(0)), anchor, atol=1e-9)
