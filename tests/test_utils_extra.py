"""Tests for timing/dot/debug/LabeledSymbol utilities, CustomFactor,
LinearContainerFactor, NonlinearISAM, DiscreteSearch k-best."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.core.keys import (
    LabeledSymbol,
    labeled_symbol,
    labeled_symbol_index,
    labeled_symbol_label,
    symbol,
    symbol_chr,
)
from gtsam_petercdev_tpu.discrete.discrete import DiscreteFactorGraph
from gtsam_petercdev_tpu.discrete.search import k_best
from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.custom import custom_factor, linear_container_factor
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.nonlinear_isam import NonlinearISAM
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
from gtsam_petercdev_tpu.utils import timing
from gtsam_petercdev_tpu.utils.debug import clear_debug_flags, is_debug, set_debug_flag
from gtsam_petercdev_tpu.utils.dot import graph_to_dot

F64 = jnp.float64


class TestTiming:
    def test_tree_structure(self):
        timing.tictoc_reset()
        with timing.tic("outer"):
            with timing.tic("inner"):
                pass
            with timing.tic("inner"):
                pass
        node = timing.tictoc_get("outer/inner")
        assert node is not None and node.n == 2
        assert timing.tictoc_get("outer").n == 1
        timing.tictoc_reset()


class TestDebug:
    def test_flags(self):
        clear_debug_flags()
        assert not is_debug("x")
        set_debug_flag("x")
        assert is_debug("x")
        clear_debug_flags()


class TestKeys:
    def test_labeled_symbol_roundtrip(self):
        k = labeled_symbol("x", "A", 42)
        assert symbol_chr(k) == "x"
        assert labeled_symbol_label(k) == "A"
        assert labeled_symbol_index(k) == 42
        ls = LabeledSymbol.from_key(k)
        assert repr(ls) == "xA42"
        assert int(ls.new_label("B")) != k

    def test_labeled_disjoint_from_symbol(self):
        # same char+index, different robots -> distinct keys
        a = labeled_symbol("x", "A", 7)
        b = labeled_symbol("x", "B", 7)
        assert a != b != symbol("x", 7)


class TestDot:
    def test_dot_output(self):
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(symbol("x", 0), "Pose2", pose2.identity(F64))
        values.insert(symbol("x", 1), "Pose2", pose2.make(1.0, 0.0, 0.0))
        graph.add(
            prior_factor("Pose2"), [symbol("x", 0)], pose2.identity(F64),
            noise.isotropic(3, 0.1, F64),
        )
        graph.add(
            between_factor("Pose2"), [symbol("x", 0), symbol("x", 1)],
            pose2.make(1.0, 0.0, 0.0), noise.isotropic(3, 0.1, F64),
        )
        dot = graph_to_dot(graph, title="toy")
        assert "x0" in dot and "x1" in dot
        assert dot.count("factor") >= 2
        assert dot.startswith("graph {") and dot.endswith("}")


class TestCustomFactor:
    def test_custom_unary(self):
        # custom "range to origin" factor on Pose2
        def err(xs, params):
            (p,) = xs
            return (jnp.sqrt(p[0] ** 2 + p[1] ** 2) - params)[None]

        ft = custom_factor("RangeToOrigin", ("Pose2",), 1, err)
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Pose2", pose2.make(2.0, 1.0, 0.3))
        graph.add(ft, [0], jnp.asarray(5.0, dtype=F64), noise.isotropic(1, 0.1, F64))
        res = optimizers.levenberg_marquardt(graph, values)
        p = np.asarray(res.values.at(0))
        assert np.hypot(p[0], p[1]) == pytest.approx(5.0, abs=1e-6)


class TestLinearContainer:
    def test_wraps_linear_factor(self):
        # linear prior: A x = b at x0 -> nonlinear solution x = x0 + A^-1 b
        ft = linear_container_factor(("Point2",), 2)
        A = jnp.asarray([[2.0, 0.0], [0.0, 4.0]], dtype=F64)
        b = jnp.asarray([1.0, 2.0], dtype=F64)
        x0 = jnp.asarray([3.0, 3.0], dtype=F64)
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, "Point2", jnp.asarray([0.0, 0.0], dtype=F64))
        graph.add(
            ft, [0], {"A": (A,), "b": b, "x0": (x0,)}, noise.unit(2, F64)
        )
        res = optimizers.gauss_newton(graph, values)
        np.testing.assert_allclose(
            np.asarray(res.values.at(0)), [3.5, 3.5], atol=1e-8
        )


class TestNonlinearISAM:
    def test_matches_batch(self):
        rng = np.random.default_rng(5)
        true = [pose2.identity(F64)]
        for _ in range(6):
            true.append(pose2.compose(true[-1], pose2.make(1.0, 0.0, 0.1)))
        isam = NonlinearISAM(reorder_interval=3)
        full_graph = NonlinearFactorGraph()
        full_values = Values()
        for i, p in enumerate(true):
            nf = NonlinearFactorGraph()
            nv = Values()
            noisy = pose2.retract(p, jnp.asarray(rng.normal(size=3) * 0.05, dtype=F64))
            nv.insert(i, "Pose2", noisy)
            full_values.insert(i, "Pose2", noisy)
            if i == 0:
                nf.add(prior_factor("Pose2"), [0], true[0], noise.isotropic(3, 0.01, F64))
                full_graph.add(prior_factor("Pose2"), [0], true[0], noise.isotropic(3, 0.01, F64))
            else:
                meas = pose2.between(true[i - 1], true[i])
                nf.add(between_factor("Pose2"), [i - 1, i], meas, noise.isotropic(3, 0.05, F64))
                full_graph.add(between_factor("Pose2"), [i - 1, i], meas, noise.isotropic(3, 0.05, F64))
            isam.update(nf, nv)
        batch = optimizers.levenberg_marquardt(full_graph, full_values)
        est = isam.estimate()
        for i in range(len(true)):
            d = pose2.local(est.at(i), batch.values.at(i))
            assert float(jnp.linalg.norm(d)) < 5e-2


class TestDiscreteSearch:
    def test_k_best_matches_enumeration(self):
        # 3 binary vars with a chain of soft constraints
        g = DiscreteFactorGraph()
        g.add([(0, 2)], [0.7, 0.3])
        g.add([(0, 2), (1, 2)], [0.9, 0.1, 0.2, 0.8])
        g.add([(1, 2), (2, 2)], [0.6, 0.4, 0.3, 0.7])
        sols = k_best(g, K=4)
        # brute force
        brute = []
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    asg = {0: a, 1: b, 2: c}
                    brute.append((g.evaluate(asg), asg))
        brute.sort(key=lambda x: -x[0])
        assert len(sols) == 4
        for s, (bv, basg) in zip(sols, brute[:4]):
            assert s.value == pytest.approx(bv, rel=1e-9)
            assert s.assignment == basg

    def test_best_matches_mpe(self):
        g = DiscreteFactorGraph()
        g.add([(0, 3)], [0.2, 0.5, 0.3])
        g.add([(0, 3), (1, 2)], [0.9, 0.1, 0.4, 0.6, 0.5, 0.5])
        best = k_best(g, K=1)[0]
        mpe = g.optimize()
        assert best.assignment == mpe
