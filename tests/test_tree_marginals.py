"""Bayes-tree marginal sweep (inference/treemarg.py) vs the dense oracle.

The reference computes ISAM2::marginalCovariance via recursive clique
shortcuts (BayesTreeCliqueBase.h:172-203); here a top-down level-batched
sweep computes every clique's joint covariance in one pass. Both must equal
the dense (J^T J)^{-1} blocks at the same linearization point.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
from gtsam_petercdev_tpu.nonlinear.marginals import Marginals
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _loop_graph(T=12, seed=1):
    rng = np.random.default_rng(seed)
    graph = NonlinearFactorGraph()
    values = Values()
    pr = noise.diagonal_sigmas(jnp.array([0.1, 0.1, 0.05]))
    od = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))
    graph.add(prior_factor("Pose2"), [0], jnp.zeros(3), pr)
    for t in range(T):
        values.insert(t, "Pose2", jnp.asarray(rng.normal(size=3) * 0.3))
        if t > 0:
            graph.add(
                between_factor("Pose2"), [t - 1, t],
                jnp.asarray([1.0, 0.0, 0.1]), od,
            )
    # loop closures -> non-chain tree with real separators
    graph.add(between_factor("Pose2"), [0, T - 1], jnp.asarray([0.0, 1.0, 0.0]), od)
    graph.add(between_factor("Pose2"), [3, 8], jnp.asarray([1.0, 1.0, 0.0]), od)
    return graph, values


def test_tree_marginals_match_dense():
    graph, values = _loop_graph()
    isam = ISAM2(ISAM2Params(enable_relinearization=False, wildfire_threshold=0.0))
    isam.update(graph, values)

    dense = Marginals(graph, values)
    for k in range(12):
        tree_cov = np.asarray(isam.marginal_covariance(k))
        dense_cov = np.asarray(dense.marginal_covariance(k))
        np.testing.assert_allclose(tree_cov, dense_cov, atol=1e-8, err_msg=str(k))


def test_tree_joint_marginal_same_clique():
    graph, values = _loop_graph()
    isam = ISAM2(ISAM2Params(enable_relinearization=False, wildfire_threshold=0.0))
    isam.update(graph, values)
    dense = Marginals(graph, values)

    # adjacent odometry pairs share a clique scope in the chain tree
    eng = isam.engine
    found = 0
    for cid, c in enumerate(eng.cliques):
        if c is None or not c.alive or len(c.frontal) + len(c.separator) < 2:
            continue
        scope = (c.frontal + c.separator)[:2]
        keys = [isam._gid_key[g] for g in scope]
        J_tree = np.asarray(isam.joint_marginal_covariance(keys))
        J_dense = np.asarray(dense.joint_marginal_covariance(keys))
        np.testing.assert_allclose(J_tree, J_dense, atol=1e-8)
        found += 1
        if found >= 3:
            break
    assert found > 0


def test_tree_marginals_after_incremental_updates():
    """Marginals stay correct after several incremental updates (the tree
    has been surgically re-eliminated, not rebuilt)."""
    rng = np.random.default_rng(5)
    isam = ISAM2(ISAM2Params(enable_relinearization=False, wildfire_threshold=0.0))
    pr = noise.diagonal_sigmas(jnp.array([0.1, 0.1, 0.05]))
    od = noise.diagonal_sigmas(jnp.array([0.2, 0.2, 0.1]))

    full_graph = NonlinearFactorGraph()
    full_values = Values()
    for t in range(10):
        nf, nv = NonlinearFactorGraph(), Values()
        x = jnp.asarray(rng.normal(size=3) * 0.3)
        nv.insert(t, "Pose2", x)
        full_values.insert(t, "Pose2", x)
        if t == 0:
            nf.add(prior_factor("Pose2"), [0], jnp.zeros(3), pr)
            full_graph.add(prior_factor("Pose2"), [0], jnp.zeros(3), pr)
        else:
            m = jnp.asarray([1.0, 0.0, 0.1])
            nf.add(between_factor("Pose2"), [t - 1, t], m, od)
            full_graph.add(between_factor("Pose2"), [t - 1, t], m, od)
        if t == 7:  # loop closure mid-stream
            m = jnp.asarray([0.0, 1.0, 0.0])
            nf.add(between_factor("Pose2"), [2, 7], m, od)
            full_graph.add(between_factor("Pose2"), [2, 7], m, od)
        isam.update(nf, nv)

    dense = Marginals(full_graph, full_values)
    for k in range(10):
        np.testing.assert_allclose(
            np.asarray(isam.marginal_covariance(k)),
            np.asarray(dense.marginal_covariance(k)),
            atol=1e-8,
            err_msg=str(k),
        )


def test_marginals_tree_method():
    """Marginals(method='tree') == dense on the same graph."""
    graph, values = _loop_graph(seed=3)
    dense = Marginals(graph, values)
    graph2, values2 = _loop_graph(seed=3)
    tree = Marginals(graph2, values2, method="tree")
    for k in range(12):
        np.testing.assert_allclose(
            np.asarray(tree.marginal_covariance(k)),
            np.asarray(dense.marginal_covariance(k)),
            atol=1e-8,
        )
