"""Dogleg + nonlinear CG optimizers on a small Pose2 pose-graph.

Mirrors gtsam/tests/testDoglegOptimizer.cpp strategy: all optimizers must
reach the same minimum as Gauss-Newton on a well-conditioned problem.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _square_problem(dtype=jnp.float64):
    """4-pose square with loop closure, noisy initial guess."""
    rng = np.random.default_rng(7)
    gt = [
        jnp.asarray([0.0, 0.0, 0.0], dtype=dtype),
        jnp.asarray([2.0, 0.0, np.pi / 2], dtype=dtype),
        jnp.asarray([2.0, 2.0, np.pi], dtype=dtype),
        jnp.asarray([0.0, 2.0, -np.pi / 2], dtype=dtype),
    ]
    graph = NonlinearFactorGraph()
    values = Values()
    for i, p in enumerate(gt):
        eps = jnp.asarray(rng.normal(size=3) * 0.2, dtype=dtype)
        values.insert(i, "Pose2", pose2.retract(p, eps) if i else p)
    graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, dtype))
    model = noise.isotropic(3, 0.1, dtype)
    for i in range(4):
        j = (i + 1) % 4
        graph.add(between_factor("Pose2"), [i, j], pose2.between(gt[i], gt[j]), model)
    return graph, values


def test_dogleg_matches_gauss_newton():
    graph, values = _square_problem()
    gn = optimizers.gauss_newton(graph, values)
    graph2, values2 = _square_problem()
    dl = optimizers.dogleg(graph2, values2, optimizers.DoglegParams(delta_initial=1.0))
    assert dl.error <= gn.error + 1e-6
    assert abs(dl.error - gn.error) < 1e-5


def test_dogleg_small_radius_still_converges():
    graph, values = _square_problem()
    dl = optimizers.dogleg(
        graph, values, optimizers.DoglegParams(delta_initial=1e-2, max_iterations=200)
    )
    gn = optimizers.gauss_newton(*_square_problem())
    assert dl.error < gn.error + 1e-4


def test_nonlinear_cg_reduces_error():
    graph, values = _square_problem()
    start_err = float(graph.error(values))
    res = optimizers.nonlinear_conjugate_gradient(
        graph, values, optimizers.OptimizerParams(max_iterations=200)
    )
    assert res.error < 0.1 * start_err


def test_mixed_precision_refinement_reaches_f64_optimum():
    """f32 device factorization + f64 host residual/retract (iterative
    refinement, SURVEY §7) must converge to the f64 GN optimum even though
    every linear solve runs in f32 (optimizers.gauss_newton_mixed_precision;
    conftest enables x64, matching the CPU test environment)."""
    import jax

    g64, v64 = _square_problem(jnp.float64)
    g32, _ = _square_problem(jnp.float32)
    ref = optimizers.gauss_newton(
        g64, v64, optimizers.OptimizerParams(max_iterations=20)
    )
    res = optimizers.gauss_newton_mixed_precision(
        g32, g64, v64, optimizers.OptimizerParams(max_iterations=20)
    )
    assert res.error <= ref.error + 1e-10
    leaf = jax.tree_util.tree_leaves(res.values)[0]
    assert leaf.dtype == jnp.float64
