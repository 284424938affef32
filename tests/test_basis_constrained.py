"""Tests for basis/ (Chebyshev2/Fourier/FitBasis, mirroring
gtsam/basis/tests/testChebyshev2.cpp + testFourier.cpp) and constrained/
(penalty + augmented Lagrangian, gtsam/constrained/tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.basis import (
    FitBasis,
    chebyshev1_weights,
    chebyshev2_derivative_weights,
    chebyshev2_differentiation_matrix,
    chebyshev2_integration_weights,
    chebyshev2_points,
    chebyshev2_weights,
    evaluation_factor,
    fourier_derivative_weights,
    fourier_weights,
)
from gtsam_petercdev_tpu.constrained import (
    EqualityConstraint,
    InequalityConstraint,
    PenaltyParams,
    augmented_lagrangian_optimize,
    penalty_optimize,
)
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import prior_factor


class TestChebyshev2:
    def test_points_endpoints(self):
        pts = chebyshev2_points(5, 0.0, 2.0)
        assert pts[0] == pytest.approx(0.0)
        assert pts[-1] == pytest.approx(2.0)
        assert np.all(np.diff(pts) > 0)

    def test_interpolation_exact_polynomial(self):
        # N Chebyshev-2 points reproduce degree<N polynomials exactly
        N = 8
        pts = chebyshev2_points(N)
        f = lambda x: 3.0 * x**5 - x**3 + 2 * x - 0.5
        fvals = jnp.asarray(f(pts))
        xq = jnp.asarray([-0.77, -0.1, 0.33, 0.9])
        W = chebyshev2_weights(N, xq)
        np.testing.assert_allclose(W @ fvals, f(np.asarray(xq)), rtol=1e-10)

    def test_interpolation_at_node_is_exact_hit(self):
        N = 6
        pts = chebyshev2_points(N)
        W = chebyshev2_weights(N, jnp.asarray(pts[2]))
        expected = np.zeros(N)
        expected[2] = 1.0
        np.testing.assert_allclose(np.asarray(W), expected, atol=1e-12)

    def test_differentiation_matrix(self):
        N = 12
        pts = chebyshev2_points(N)
        f = np.sin(pts)
        D = chebyshev2_differentiation_matrix(N)
        np.testing.assert_allclose(D @ f, np.cos(pts), atol=1e-8)

    def test_derivative_weights(self):
        N = 12
        pts = chebyshev2_points(N)
        f = jnp.asarray(np.exp(pts))
        w = chebyshev2_derivative_weights(N, jnp.asarray(0.4))
        assert float(w @ f) == pytest.approx(np.exp(0.4), rel=1e-8)

    def test_integration_weights(self):
        # Clenshaw-Curtis integrates polynomials of degree < N exactly
        N = 9
        pts = chebyshev2_points(N, 0.0, 1.0)
        w = chebyshev2_integration_weights(N, 0.0, 1.0)
        assert w @ (pts**4) == pytest.approx(1.0 / 5.0, rel=1e-10)
        assert w.sum() == pytest.approx(1.0, rel=1e-12)

    def test_chebyshev1_rows(self):
        w = chebyshev1_weights(4, jnp.asarray(0.5))
        # T0=1, T1=t, T2=2t^2-1, T3=4t^3-3t at t=0.5
        np.testing.assert_allclose(
            np.asarray(w), [1.0, 0.5, -0.5, -1.0], atol=1e-7
        )


class TestFourier:
    def test_weights(self):
        x = 0.7
        w = fourier_weights(5, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(w),
            [1, np.cos(x), np.sin(x), np.cos(2 * x), np.sin(2 * x)],
            atol=1e-7,
        )

    def test_derivative_is_grad(self):
        import jax

        x = jnp.asarray(0.3, dtype=jnp.float64)
        c = jnp.asarray([0.1, -0.4, 0.9, 0.2, -0.3], dtype=jnp.float64)
        f = lambda t: fourier_weights(5, t) @ c
        assert float(fourier_derivative_weights(5, x) @ c) == pytest.approx(
            float(jax.grad(f)(x)), rel=1e-10
        )


class TestFitBasis:
    def test_fit_recovers_function(self):
        xs = np.linspace(-1, 1, 40)
        f = lambda x: np.exp(np.sin(2 * x))
        fit = FitBasis(xs, f(xs), 14, chebyshev2_weights)
        xq = np.asarray([-0.5, 0.0, 0.62])
        np.testing.assert_allclose(np.asarray(fit(xq)), f(xq), atol=1e-4)

    def test_evaluation_factor_in_graph(self):
        # Fit 3 Fourier coefficients through the nonlinear pipeline
        from gtsam_petercdev_tpu.nonlinear import optimizers

        N = 3
        c_true = np.array([1.0, 0.5, -0.2])
        xs = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        ys = fourier_weights(N, jnp.asarray(xs)) @ jnp.asarray(c_true)

        ft = evaluation_factor(N, fourier_weights)
        graph = NonlinearFactorGraph()
        values = Values()
        values.insert(0, f"Vector{N}", jnp.zeros(N))
        for x, y in zip(xs, np.asarray(ys)):
            graph.add(
                ft,
                [0],
                {"x": jnp.asarray(x), "y": jnp.asarray(y)},
                noise.isotropic(1, 1.0),
            )
        res = optimizers.gauss_newton(graph, values)
        np.testing.assert_allclose(np.asarray(res.values.at(0)), c_true, atol=1e-8)


def _point3_prior_graph(target):
    graph = NonlinearFactorGraph()
    values = Values()
    values.insert(0, "Point3", jnp.asarray([0.0, 0.0, 0.0]))
    graph.add(
        prior_factor("Point3"), [0], jnp.asarray(target), noise.isotropic(3, 1.0)
    )
    return graph, values


class TestConstrained:
    def test_equality_penalty(self):
        # min ||x - (1,1,1)||^2  s.t.  x0 + x1 + x2 = 0
        graph, values = _point3_prior_graph([1.0, 1.0, 1.0])
        con = EqualityConstraint(
            name="sum0",
            var_types=("Point3",),
            dim=1,
            g=lambda xs, p: jnp.sum(xs[0])[None],
            keys=[0],
        )
        res = penalty_optimize(graph, [con], values, PenaltyParams(mu_rate=10.0))
        x = np.asarray(res.values.at(0))
        assert abs(x.sum()) < 1e-4
        # projection of (1,1,1) onto the plane sum(x)=0 is the origin
        np.testing.assert_allclose(x, [0.0, 0.0, 0.0], atol=1e-3)

    def test_equality_augmented_lagrangian(self):
        graph, values = _point3_prior_graph([1.0, 1.0, 1.0])
        con = EqualityConstraint(
            name="sum0",
            var_types=("Point3",),
            dim=1,
            g=lambda xs, p: jnp.sum(xs[0])[None],
            keys=[0],
        )
        res = augmented_lagrangian_optimize(
            graph, [con], values, PenaltyParams(constraint_tol=1e-8)
        )
        x = np.asarray(res.values.at(0))
        assert abs(x.sum()) < 1e-7
        np.testing.assert_allclose(x, [0.0, 0.0, 0.0], atol=1e-6)

    def test_inequality_active(self):
        # min ||x - (1,1,1)||^2 s.t. x0 <= 0.2 (active at optimum)
        graph, values = _point3_prior_graph([1.0, 1.0, 1.0])
        con = InequalityConstraint(
            name="x0cap",
            var_types=("Point3",),
            dim=1,
            g=lambda xs, p: (xs[0][0] - 0.2)[None],
            keys=[0],
        )
        res = augmented_lagrangian_optimize(graph, [con], values)
        x = np.asarray(res.values.at(0))
        assert x[0] <= 0.2 + 1e-5
        np.testing.assert_allclose(x[1:], [1.0, 1.0], atol=1e-6)

    def test_inequality_inactive(self):
        # constraint x0 <= 5 is inactive: solution = unconstrained optimum
        graph, values = _point3_prior_graph([1.0, 1.0, 1.0])
        con = InequalityConstraint(
            name="x0cap",
            var_types=("Point3",),
            dim=1,
            g=lambda xs, p: (xs[0][0] - 5.0)[None],
            keys=[0],
        )
        res = augmented_lagrangian_optimize(graph, [con], values)
        np.testing.assert_allclose(np.asarray(res.values.at(0)), [1, 1, 1], atol=1e-6)
