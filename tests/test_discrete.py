"""Discrete factor graphs: elimination, MPE, marginals, signatures.

Mirrors gtsam/discrete/tests/testDiscreteFactorGraph.cpp style cases.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.discrete.discrete import (
    DiscreteFactorGraph,
    signature_table,
)


def test_joint_and_evaluate():
    g = DiscreteFactorGraph()
    # P(A), P(B|A) as potentials; A,B binary
    g.add([(0, 2)], [0.4, 0.6])
    g.add([(0, 2), (1, 2)], [0.9, 0.1, 0.2, 0.8])  # rows over A, cols B
    j = g.joint().normalized()
    np.testing.assert_allclose(float(jnp.sum(j.table)), 1.0, atol=1e-12)
    # P(A=1,B=1) = 0.6*0.8 / Z, Z = 1 here since rows normalized
    np.testing.assert_allclose(float(j.table[1, 1]), 0.6 * 0.8, atol=1e-12)


def test_mpe_simple_chain():
    # Markov chain A - B - C, biased toward all-ones
    g = DiscreteFactorGraph()
    g.add([(0, 2)], [0.3, 0.7])
    g.add([(0, 2), (1, 2)], [0.8, 0.2, 0.2, 0.8])  # agreement potential
    g.add([(1, 2), (2, 2)], [0.8, 0.2, 0.2, 0.8])
    mpe = g.optimize()
    assert mpe == {0: 1, 1: 1, 2: 1}, mpe

    # brute-force check
    best, best_p = None, -1.0
    for a in range(2):
        for b in range(2):
            for c in range(2):
                p = g.evaluate({0: a, 1: b, 2: c})
                if p > best_p:
                    best, best_p = {0: a, 1: b, 2: c}, p
    assert mpe == best


def test_mpe_matches_bruteforce_random():
    rng = np.random.default_rng(0)
    g = DiscreteFactorGraph()
    cards = {0: 2, 1: 3, 2: 2, 3: 2}
    g.add([(0, 2), (1, 3)], rng.uniform(0.1, 1.0, size=6))
    g.add([(1, 3), (2, 2)], rng.uniform(0.1, 1.0, size=6))
    g.add([(2, 2), (3, 2)], rng.uniform(0.1, 1.0, size=4))
    g.add([(0, 2), (3, 2)], rng.uniform(0.1, 1.0, size=4))
    mpe = g.optimize()

    best, best_p = None, -1.0
    for a in range(2):
        for b in range(3):
            for c in range(2):
                for d in range(2):
                    asg = {0: a, 1: b, 2: c, 3: d}
                    p = g.evaluate(asg)
                    if p > best_p:
                        best, best_p = asg, p
    assert abs(g.evaluate(mpe) - best_p) < 1e-12, (mpe, best)


def test_marginals_match_bruteforce():
    rng = np.random.default_rng(1)
    g = DiscreteFactorGraph()
    g.add([(0, 2), (1, 2)], rng.uniform(0.1, 1.0, size=4))
    g.add([(1, 2), (2, 3)], rng.uniform(0.1, 1.0, size=6))
    joint = np.asarray(g.joint().normalized().table)  # axes sorted keys 0,1,2
    m0 = np.asarray(g.marginal(0))
    np.testing.assert_allclose(m0, joint.sum(axis=(1, 2)), atol=1e-12)
    m2 = np.asarray(g.marginal(2))
    np.testing.assert_allclose(m2, joint.sum(axis=(0, 1)), atol=1e-12)


def test_bayes_net_sampling_consistency():
    g = DiscreteFactorGraph()
    g.add([(0, 2)], [0.25, 0.75])
    g.add([(0, 2), (1, 2)], [0.9, 0.1, 0.3, 0.7])
    bn = g.eliminate_sequential([1, 0])  # eliminate B first, then A
    rng = np.random.default_rng(2)
    counts = np.zeros(2)
    n = 4000
    for _ in range(n):
        s = bn.sample(rng)
        counts[s[0]] += 1
    np.testing.assert_allclose(counts / n, [0.25, 0.75], atol=0.03)


def test_signature_table():
    t = signature_table("4/1 1/4", 2, [2])
    # P(F=0|P=0)=0.8, P(F=0|P=1)=0.2
    np.testing.assert_allclose(t[0, 0], 0.8)
    np.testing.assert_allclose(t[0, 1], 0.2)
    np.testing.assert_allclose(t.sum(axis=0), [1.0, 1.0])


def test_k_best_exact_vs_brute_force():
    """Best-first DiscreteSearch is EXACT: K best assignments equal the
    brute-force enumeration in order (DiscreteSearch.cpp semantics)."""
    import itertools

    from gtsam_petercdev_tpu.discrete.search import k_best

    rng = np.random.default_rng(0)
    g = DiscreteFactorGraph()
    cards = [2, 3, 2, 3, 2, 2]
    for i in range(6):
        g.add([(i, cards[i])], rng.uniform(0.1, 1.0, cards[i]))
    for (a, b) in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 5)]:
        g.add(
            [(a, cards[a]), (b, cards[b])],
            rng.uniform(0.1, 1.0, (cards[a], cards[b])),
        )
    sols = k_best(g, 10)
    best = []
    for asg in itertools.product(*[range(c) for c in cards]):
        d = dict(enumerate(asg))
        v = 1.0
        for f in g.factors:
            v *= f.value(d)
        best.append((v, d))
    best.sort(key=lambda x: -x[0])
    for i in range(10):
        assert abs(sols[i].value - best[i][0]) < 1e-12
        assert sols[i].assignment == best[i][1]
