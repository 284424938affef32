"""Supernodal multifrontal solver vs the dense oracle.

The reference validates its multifrontal pipeline against sequential
elimination and hand-computed examples (tests/testGaussianJunctionTreeB.cpp);
here the oracle is the dense scatter-assembled Cholesky (linear/solve.py),
which is itself autodiff-verified in test_pose2_slam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from gtsam_petercdev_tpu.inference import elimination, symbolic
from gtsam_petercdev_tpu.linear import noise, solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import (
    OptimizerParams,
    gauss_newton,
)
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _random_pose2_graph(n_poses, n_loops, rng):
    from gtsam_petercdev_tpu.geometry import pose2

    graph = NonlinearFactorGraph()
    values = Values()
    gt = [jnp.zeros(3, dtype=jnp.float64)]
    for i in range(1, n_poses):
        xi = jnp.asarray(rng.normal(size=3) * 0.4)
        gt.append(pose2.retract(gt[-1], xi))
    for i, p in enumerate(gt):
        values.insert(i, "Pose2", pose2.retract(p, jnp.asarray(rng.normal(size=3) * 0.1)))
    graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.1, jnp.float64))
    for i in range(n_poses - 1):
        graph.add(
            between_factor("Pose2"),
            [i, i + 1],
            pose2.between(gt[i], gt[i + 1]),
            noise.isotropic(3, 0.05, jnp.float64),
        )
    for _ in range(n_loops):
        i, j = sorted(rng.choice(n_poses, size=2, replace=False))
        graph.add(
            between_factor("Pose2"),
            [int(i), int(j)],
            pose2.between(gt[i], gt[j]),
            noise.isotropic(3, 0.05, jnp.float64),
        )
    graph._materialize()
    return graph, values


@pytest.mark.parametrize("n_poses,n_loops", [(12, 4), (60, 25), (150, 60)])
def test_multifrontal_matches_dense(n_poses, n_loops, rng):
    graph, values = _random_pose2_graph(n_poses, n_loops, rng)
    lg = graph.linearize(values)

    # dense oracle
    H, g = linsolve.assemble_dense(lg)
    lam = 1e-3
    x_dense = linsolve.dense_solve(H, g, lam)
    x_dense = linsolve.unflatten_delta(lg, x_dense)["Pose2"]

    # multifrontal
    plan = elimination.build_plan_for_graph(
        [(lb.rows, "Pose2") for lb in lg.batches], n_poses, 3
    )
    stats = plan.stats()
    assert stats["n_cliques"] >= 1
    maps = elimination.build_numeric_maps(plan, lg)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x_mf = elimination.multifrontal_solve(maps, Ab, lam)
    np.testing.assert_allclose(np.asarray(x_mf), np.asarray(x_dense), atol=1e-8)


def test_multifrontal_diag_damping_matches_dense(rng):
    graph, values = _random_pose2_graph(40, 15, rng)
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    x_dense = linsolve.unflatten_delta(
        lg, linsolve.dense_solve(H, g, 0.1, diagonal_damping=True)
    )["Pose2"]
    plan = elimination.build_plan_for_graph(
        [(lb.rows, "Pose2") for lb in lg.batches], 40, 3
    )
    maps = elimination.build_numeric_maps(plan, lg)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x_mf = elimination.multifrontal_solve(maps, Ab, 0.1, diagonal_damping=True)
    np.testing.assert_allclose(np.asarray(x_mf), np.asarray(x_dense), atol=1e-8)


def test_gn_with_multifrontal_solver(rng):
    graph, values = _random_pose2_graph(30, 10, rng)
    res_d = gauss_newton(graph, values, OptimizerParams(max_iterations=15))
    res_m = gauss_newton(
        graph, values, OptimizerParams(max_iterations=15, solver="multifrontal")
    )
    assert abs(res_m.error - res_d.error) < 1e-9
    for k in (0, 15, 29):
        np.testing.assert_allclose(
            np.asarray(res_m.values.at(k)), np.asarray(res_d.values.at(k)), atol=1e-6
        )


def test_constrained_ordering():
    edges = np.array([[0, 1], [1, 2], [2, 3], [0, 3]])
    perm = symbolic.constrained_colamd_ordering(4, edges, np.array([1]))
    assert perm[-1] == 1
    assert sorted(perm.tolist()) == [0, 1, 2, 3]


def test_subgraph_solver_matches_dense():
    """SubgraphSolver (tree-preconditioned PCG over multifrontal_factor /
    multifrontal_apply) reaches the damped dense solution."""
    import __graft_entry__ as ge
    from gtsam_petercdev_tpu.linear import subgraph
    from gtsam_petercdev_tpu.linear import solve as linsolve

    g, v = ge._toy_pose3_problem(n_poses=12, dtype=jnp.float64)
    lg = g.linearize(v)
    sol = subgraph.SubgraphSolver(lg)
    x = sol.solve(lam=1e-6)
    H, gg = linsolve.assemble_dense(lg)
    x_ref = np.linalg.solve(
        np.asarray(H) + 1e-6 * np.eye(H.shape[0]), np.asarray(gg)
    )
    xf = np.concatenate([np.asarray(x[t]).reshape(-1) for t in sorted(x)])
    np.testing.assert_allclose(xf, x_ref, atol=1e-8)
