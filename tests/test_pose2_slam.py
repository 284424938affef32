"""End-to-end Pose2 SLAM tests: linearization oracle, solvers, golden parity.

Golden test mirrors the reference recipe of examples/Pose2SLAMExample_g2o.cpp
(+ python variant): load noisyToyGraph.txt, add a tight Diagonal prior on pose
0, Gauss-Newton optimize, compare against the shipped
optimizedNoisyToyGraph.txt result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise, solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import (
    LMParams,
    OptimizerParams,
    gauss_newton,
    levenberg_marquardt,
)
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
from gtsam_petercdev_tpu.utils import dataset


def toy_graph(gtsam_compatible=True):
    """Tiny odometry + loop-closure Pose2 graph with a tight prior."""
    graph = NonlinearFactorGraph()
    prior_sqrt = noise.diagonal_sigmas(jnp.array([0.3, 0.3, 0.1]))
    odo_sqrt = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    graph.add(
        prior_factor("Pose2", gtsam_compatible), [0], jnp.array([0.0, 0.0, 0.0]), prior_sqrt
    )
    graph.add(
        between_factor("Pose2", gtsam_compatible), [0, 1], jnp.array([2.0, 0.0, 0.0]), odo_sqrt
    )
    graph.add(
        between_factor("Pose2", gtsam_compatible), [1, 2], jnp.array([2.0, 0.0, np.pi / 2]), odo_sqrt
    )
    values = Values()
    values.insert(0, "Pose2", jnp.array([0.5, 0.0, 0.2]))
    values.insert(1, "Pose2", jnp.array([2.3, 0.1, -0.2]))
    values.insert(2, "Pose2", jnp.array([4.1, 0.1, np.pi / 2 + 0.1]))
    return graph, values


def test_linearize_gradient_oracle():
    """gradient(lg) must equal -d error(x ⊞ delta)/d delta at 0 (autodiff).

    Uses consistent (non-gtsam-compatible) Jacobians — the reference's default
    Between/Prior Jacobians intentionally drop the Local chain term.
    """
    graph, values = toy_graph(gtsam_compatible=False)
    lg = graph.linearize(values)
    g = linsolve.gradient(lg)

    def err_of_delta(delta):
        return graph.error(values.retract(delta))

    auto = jax.grad(err_of_delta)(values.zero_delta())
    for t in g:
        np.testing.assert_allclose(np.asarray(g[t]), -np.asarray(auto[t]), atol=1e-9)


def test_hvp_matches_dense():
    graph, values = toy_graph()
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    rng = np.random.default_rng(0)
    v = {t: jnp.asarray(rng.normal(size=x.shape)) for t, x in values.zero_delta().items()}
    hv = linsolve.hvp(lg, v)
    vflat = linsolve.flatten_delta(lg, v)
    hv_dense = linsolve.unflatten_delta(lg, H @ vflat)
    for t in hv:
        np.testing.assert_allclose(np.asarray(hv[t]), np.asarray(hv_dense[t]), atol=1e-9)
    gd = linsolve.unflatten_delta(lg, g)
    gref = linsolve.gradient(lg)
    for t in gd:
        np.testing.assert_allclose(np.asarray(gd[t]), np.asarray(gref[t]), atol=1e-9)


def test_gauss_newton_toy():
    graph, values = toy_graph()
    res = gauss_newton(graph, values, OptimizerParams(max_iterations=20))
    assert res.converged
    assert res.error < 1e-10
    x2 = np.asarray(res.values.at(2))
    np.testing.assert_allclose(x2, [4.0, 0.0, np.pi / 2], atol=1e-6)


def test_pcg_matches_dense_solution():
    graph, values = toy_graph()
    res_d = gauss_newton(graph, values, OptimizerParams(max_iterations=20))
    res_p = gauss_newton(
        graph, values, OptimizerParams(max_iterations=20, solver="pcg", pcg_tol=1e-14)
    )
    for k in (0, 1, 2):
        np.testing.assert_allclose(
            np.asarray(res_p.values.at(k)), np.asarray(res_d.values.at(k)), atol=1e-6
        )


def test_lm_toy():
    graph, values = toy_graph()
    res = levenberg_marquardt(graph, values, LMParams(max_iterations=30))
    assert res.error < 1e-10


def test_noisy_toy_graph_golden_parity():
    """Match reference optimizedNoisyToyGraph.txt (Pose2SLAMExample_g2o)."""
    path = dataset.find_example_data("noisyToyGraph.txt")
    graph, values = dataset.read_g2o(path)
    prior_sqrt = noise.diagonal_precisions(jnp.array([1e6, 1e6, 1e8]))
    graph.add(
        prior_factor("Pose2"), [0], jnp.array([0.0, 0.0, 0.0]), prior_sqrt
    )
    res = gauss_newton(graph, values, OptimizerParams(max_iterations=100))

    # Golden regenerated with the locally-built reference (Release, default
    # flags): tests/data/ref_noisyToyGraph_optimized.g2o; its reported errors
    # were initial=0.391637509949 final=0.0685034664998.
    np.testing.assert_allclose(float(graph.error(values)), 0.391637509949, atol=1e-9)
    assert abs(float(graph.error(res.values)) - 0.0685034664998) < 1e-5
    import os

    golden_path = os.path.join(
        os.path.dirname(__file__), "data", "ref_noisyToyGraph_optimized.g2o"
    )
    _g, golden = dataset.read_g2o(golden_path)
    for k in range(4):
        got = np.asarray(res.values.at(k))
        want = np.asarray(golden.at(k))
        np.testing.assert_allclose(got[:2], want[:2], atol=1e-4)
        dth = np.arctan2(np.sin(got[2] - want[2]), np.cos(got[2] - want[2]))
        assert abs(dth) < 1e-4, (k, got, want)


def test_error_matches_reference_convention():
    """error = 0.5 sum ||whitened||^2."""
    graph = NonlinearFactorGraph()
    sq = noise.isotropic(3, 0.5)  # weight 2 per row
    graph.add(prior_factor("Pose2"), [0], jnp.array([1.0, 0.0, 0.0]), sq)
    values = Values()
    values.insert(0, "Pose2", jnp.array([0.0, 0.0, 0.0]))
    # r = local(prior, x) = (-1, 0, 0); whitened = (-2, 0, 0); error = 2.
    np.testing.assert_allclose(float(graph.error(values)), 2.0, atol=1e-9)
