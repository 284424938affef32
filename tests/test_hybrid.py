"""Hybrid (discrete x Gaussian) inference.

Mirrors gtsam/hybrid/tests cases: switching measurement models where a
discrete mode selects which Gaussian explains the data; posteriors are
checked against closed-form conditional-linear-Gaussian evidence.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.hybrid.hybrid import HybridGaussianFactorGraph


def test_mode_selection_picks_consistent_gaussian():
    """x ~ N(1, 1); z=2 measured; mode 0 says z=x, mode 1 says z=-x.
    Evidence: p(z|m=0) = N(2; 1, 2), p(z|m=1) = N(2; -1, 2)."""
    g = HybridGaussianFactorGraph()
    # prior x ~ N(1, 1): residual (x - 1)
    g.add_continuous([(0, 1)], [jnp.asarray([[1.0]])], jnp.asarray([1.0]))
    s = 1.0
    # mode 0: (x - 2)/s; mode 1: (-x - 2)/s  (z=2 plugged in)
    A = jnp.asarray([[[1.0 / s]], [[-1.0 / s]]])
    b = jnp.asarray([[2.0 / s], [2.0 / s]])
    g.add_hybrid([(0, 1)], [(10, 2)], [A], b, log_norm=jnp.log(jnp.asarray([1 / s, 1 / s])))
    g.add_discrete([(10, 2)], [0.5, 0.5])

    bn = g.eliminate()
    asg, cont = bn.optimize()
    assert asg[10] == 0
    # posterior mean of x given mode 0: (1 + 2)/2 = 1.5
    np.testing.assert_allclose(cont[0][0], 1.5, atol=1e-9)

    marg = bn.discrete_marginal(10)

    def normal_pdf(x, mu, var):
        return np.exp(-0.5 * (x - mu) ** 2 / var) / np.sqrt(2 * np.pi * var)

    expected = np.array([normal_pdf(2, 1, 2), normal_pdf(2, -1, 2)])
    expected /= expected.sum()
    np.testing.assert_allclose(marg, expected, rtol=1e-9)


def test_posterior_matches_hand_computation():
    """Two modes with different noise scales — checks both the det-H term
    and the noise normalizer. x ~ N(0,1), z=2: p(z|m) = N(2; 0, 1 + s_m^2)."""
    g = HybridGaussianFactorGraph()
    z = 2.0
    s0, s1 = 1.0, 10.0
    g.add_continuous([(0, 1)], [jnp.asarray([[1.0]])], jnp.asarray([0.0]))
    A = jnp.asarray([[[1.0 / s0]], [[1.0 / s1]]])
    b = jnp.asarray([[z / s0], [z / s1]])
    g.add_hybrid(
        [(0, 1)], [(5, 2)], [A], b, log_norm=jnp.log(jnp.asarray([1 / s0, 1 / s1]))
    )
    g.add_discrete([(5, 2)], [0.5, 0.5])
    bn = g.eliminate()
    marg = bn.discrete_marginal(5)

    def normal_pdf(x, mu, var):
        return np.exp(-0.5 * (x - mu) ** 2 / var) / np.sqrt(2 * np.pi * var)

    expected = np.array([normal_pdf(z, 0, 1 + s0**2), normal_pdf(z, 0, 1 + s1**2)])
    expected /= expected.sum()
    np.testing.assert_allclose(marg, expected, rtol=1e-9)


def test_switching_chain_map():
    """3-step switching system: x_{t+1} = x_t + u(m_t). True modes 0,1."""
    g = HybridGaussianFactorGraph()
    u = {0: 1.0, 1: -1.0}
    true_modes = [0, 1]
    x_true = [0.0]
    for m in true_modes:
        x_true.append(x_true[-1] + u[m])
    g.add_continuous([(0, 1)], [jnp.asarray([[100.0]])], jnp.asarray([0.0]))
    for t, xt in enumerate(x_true):
        g.add_continuous([(t, 1)], [jnp.asarray([[10.0]])], jnp.asarray([10.0 * xt]))
    for t, m_true in enumerate(true_modes):
        A = jnp.asarray([[[-10.0]], [[-10.0]]])  # coeff of x_t
        A2 = jnp.asarray([[[10.0]], [[10.0]]])  # coeff of x_{t+1}
        b = jnp.asarray([[10.0 * u[0]], [10.0 * u[1]]])
        g.add_hybrid([(t, 1), (t + 1, 1)], [(100 + t, 2)], [A, A2], b)
        g.add_discrete([(100 + t, 2)], [0.5, 0.5])

    bn = g.eliminate()
    asg, cont = bn.optimize()
    assert [asg[100], asg[101]] == true_modes
    for t, xt in enumerate(x_true):
        assert abs(cont[t][0] - xt) < 0.05

    pruned = bn.prune(2)
    asg2, _ = pruned.optimize()
    assert asg2 == asg
    np.testing.assert_allclose(np.exp(pruned.log_probs).sum(), 1.0, atol=1e-9)


def test_hybrid_smoother_matches_batch():
    """Incremental HybridSmoother (pruned hypotheses) == batch full-grid
    elimination on a switching chain when max_leaves covers the grid, and
    stays correct on the dominant hypothesis with aggressive pruning
    (HybridSmoother.h semantics)."""
    from gtsam_petercdev_tpu.hybrid.incremental import HybridSmoother

    def make_slice(t, xt):
        g = HybridGaussianFactorGraph()
        if t == 0:
            g.add_continuous([(0, 1)], [jnp.asarray([[100.0]])], jnp.asarray([0.0]))
        g.add_continuous([(t, 1)], [jnp.asarray([[10.0]])], jnp.asarray([10.0 * xt]))
        if t > 0:
            # mode selects step +1 or -1 between x_{t-1} and x_t
            A = jnp.asarray([[[-1.0]], [[-1.0]]])
            A2 = jnp.asarray([[[1.0]], [[1.0]]])
            b = jnp.asarray([[1.0], [-1.0]])
            g.add_hybrid([(t - 1, 1), (t, 1)], [(100 + t, 2)], [A, A2], b)
            g.add_discrete([(100 + t, 2)], [0.5, 0.5])
        return g

    xs = [0.0, 1.0, 2.0, 1.0]  # true modes: +1, +1, -1

    # batch reference
    batch = HybridGaussianFactorGraph()
    for t, xt in enumerate(xs):
        s = make_slice(t, xt)
        batch.gaussians.extend(s.gaussians)
        batch.discrete.extend(s.discrete)
        batch.cont_dims.update(s.cont_dims)
        batch.disc_cards.update(s.disc_cards)
    bn_batch = batch.eliminate()
    asg_b, cont_b = bn_batch.optimize()

    # incremental, no real pruning (max_leaves = 8 = full grid)
    sm = HybridSmoother(max_leaves=8)
    for t, xt in enumerate(xs):
        sm.update(make_slice(t, xt))
    asg_i, cont_i = sm.optimize()
    assert asg_i == asg_b
    for k in cont_b:
        np.testing.assert_allclose(cont_i[k], cont_b[k], atol=1e-9)

    # aggressive pruning still finds the dominant mode sequence
    sm2 = HybridSmoother(max_leaves=2)
    for t, xt in enumerate(xs):
        sm2.update(make_slice(t, xt))
    asg_p, _ = sm2.optimize()
    assert asg_p == asg_b
    assert sm2._hyp.shape[0] <= 2


def test_hybrid_gaussian_isam_alias():
    from gtsam_petercdev_tpu.hybrid.incremental import HybridGaussianISAM

    isam = HybridGaussianISAM(max_leaves=4)
    g = HybridGaussianFactorGraph()
    g.add_continuous([(0, 1)], [jnp.asarray([[1.0]])], jnp.asarray([1.0]))
    bn = isam.update(g)
    _, cont = bn.optimize()
    np.testing.assert_allclose(cont[0][0], 1.0, atol=1e-12)


def test_eliminate_sparse_matches_dense():
    """The sparse per-hypothesis multifrontal path reproduces the dense
    CLG posterior and solutions on a conflicting-hypothesis chain."""
    from gtsam_petercdev_tpu.hybrid.hybrid import (
        HybridGaussianFactorGraph,
        eliminate_sparse,
    )

    dim = 2
    n = 6
    g = HybridGaussianFactorGraph()
    g.add_continuous([(0, dim)], (jnp.eye(dim),), jnp.zeros(dim))
    # anchor the far end so the two step hypotheses CONFLICT
    g.add_continuous(
        [(n - 1, dim)], (jnp.eye(dim),), jnp.asarray([float(n - 1), 0.0])
    )
    for i in range(n - 1):
        A = (-jnp.eye(dim), jnp.eye(dim))
        if i == 2:
            Ah = tuple(jnp.stack([a, a]) for a in A)
            bh = jnp.stack([jnp.asarray([1.0, 0.0]), jnp.asarray([5.0, 0.0])])
            g.add_hybrid([(i, dim), (i + 1, dim)], [(100, 2)], Ah, bh)
        else:
            g.add_continuous(
                [(i, dim), (i + 1, dim)], A, jnp.asarray([1.0, 0.0])
            )
    g.add_discrete([(100, 2)], jnp.asarray([0.5, 0.5]))
    bd = g.eliminate()
    bs = eliminate_sparse(g)
    np.testing.assert_allclose(bs.log_probs, bd.log_probs, atol=1e-6)
    np.testing.assert_allclose(bs.solutions, bd.solutions, atol=1e-6)
    # the consistent hypothesis must dominate
    probs = np.exp(bs.log_probs)
    assert probs[0] > 0.7  # odds ratio exp(dE) ~ 3.8 for this geometry
