"""FitBasis: least-squares fit of basis coefficients to samples.

Reference: gtsam/basis/FitBasis.h:52 — builds EvaluationFactors from a
{x: y} sample dict and solves the resulting linear graph. Here the normal
equations are one batched matmul (W^T W) c = W^T y: exactly the MXU shape.
`evaluation_factor` exposes the same measurement as a FactorType for use in
arbitrary nonlinear graphs.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


def _coeff_type(N: int) -> str:
    name = f"Vector{N}"
    try:
        manifold.get(name)
    except KeyError:
        manifold.register(manifold.vector_space(name, N))
    return name


def evaluation_factor(N: int, weight_fn: Callable) -> FactorType:
    """Factor on a coefficient vector: r = W(x) @ c - y.

    params = {"x": scalar sample point, "y": scalar measurement}.
    weight_fn(N, x) -> [N] evaluation row (e.g. chebyshev2_weights).
    Mirrors gtsam/basis/BasisFactors.h EvaluationFactor.
    """
    tname = _coeff_type(N)

    def residual(xs, params):
        (c,) = xs
        w = weight_fn(N, params["x"])
        return (w @ c - params["y"])[None]

    return FactorType(
        name=f"BasisEval{N}_{getattr(weight_fn, '__name__', 'w')}",
        var_types=(tname,),
        resid_dim=1,
        residual=residual,
    )


class FitBasis:
    """Least-squares basis fit; .coefficients ready for W(x) @ c eval."""

    def __init__(self, xs, ys, N: int, weight_fn: Callable):
        xs = jnp.asarray(xs)
        ys = jnp.asarray(ys)
        W = weight_fn(N, xs)  # [M, N]
        # normal equations via one matmul pair; small N so direct solve
        WtW = W.T @ W
        Wty = W.T @ ys
        self.N = N
        self.weight_fn = weight_fn
        self.coefficients = jnp.linalg.solve(
            WtW + 1e-12 * jnp.eye(N, dtype=WtW.dtype), Wty
        )

    def __call__(self, x):
        return self.weight_fn(self.N, jnp.asarray(x)) @ self.coefficients
