"""Equality/inequality-constrained nonlinear optimization.

Reference: gtsam/constrained/ (NonlinearEqualityConstraint.h,
NonlinearInequalityConstraint.h and the penalty-function building blocks).
The reference expresses constraints as noise-model factors with sigma=0
handled by mu-weighted penalties; here constraints are explicit residual
specs and the outer loops are the two classic schemes:

- `penalty_optimize`: quadratic penalty, mu <- mu * rate each outer iter.
- `augmented_lagrangian_optimize`: multiplier estimates lambda absorb the
  constraint so mu stays bounded. The AL term
  mu/2 ||g(x) + lambda/mu||^2 is realized by shifting the constraint
  residual — no new machinery beyond ordinary weighted factors, so every
  inner solve is the standard batched TPU LM/GN path.

Inequalities g(x) <= 0 use the softplus-free max(0, g) slack trick with
active-set masking inside jnp.where (jit-safe).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass
class EqualityConstraint:
    """g(xs, params) = 0 (dim-dimensional)."""

    name: str
    var_types: Tuple[str, ...]
    dim: int
    g: Callable[[Tuple[Any, ...], Any], jnp.ndarray]
    keys: Sequence[int]
    params: Any = None


@dataclass
class InequalityConstraint:
    """g(xs, params) <= 0 elementwise (dim-dimensional)."""

    name: str
    var_types: Tuple[str, ...]
    dim: int
    g: Callable[[Tuple[Any, ...], Any], jnp.ndarray]
    keys: Sequence[int]
    params: Any = None


@dataclass
class PenaltyParams:
    mu_initial: float = 1.0
    mu_rate: float = 10.0
    max_outer_iterations: int = 12
    constraint_tol: float = 1e-6
    inner: Optional[optimizers.LMParams] = None


def _constraint_factor(c, shifted: bool, uid: int = 0) -> FactorType:
    """FactorType whose residual is g(x) (+ dual shift when shifted).

    `uid` disambiguates the FactorType name: batching groups factors by
    name, and two constraints sharing a display name but carrying different
    g callables must NOT be stacked into one batch (the first closure would
    silently evaluate both).
    """

    def residual(xs, params):
        r = c.g(xs, params["user"])
        if isinstance(c, InequalityConstraint):
            # active when violated or pushed by the multiplier
            r = jnp.maximum(r, -params["shift"] if shifted else 0.0)
        if shifted:
            r = r + params["shift"]
        return r

    return FactorType(
        name=f"Constraint_{c.name}_{uid}",
        var_types=tuple(c.var_types),
        resid_dim=c.dim,
        residual=residual,
    )


def _augment(
    graph: NonlinearFactorGraph,
    constraints,
    mu: float,
    duals,
    dtype,
) -> NonlinearFactorGraph:
    """Combined graph = objective factors + mu-weighted constraint factors."""
    aug = NonlinearFactorGraph()
    graph._materialize()
    aug.batches = list(graph.batches)
    sqrt_mu = float(np.sqrt(mu))
    for ci, (c, lam) in enumerate(zip(constraints, duals)):
        ft = _constraint_factor(c, shifted=True, uid=ci)
        shift = jnp.asarray(lam, dtype=dtype) / mu
        aug.add(
            ft,
            list(c.keys),
            {"user": c.params, "shift": shift},
            sqrt_mu * jnp.eye(c.dim, dtype=dtype),
        )
    aug._materialize()
    return aug


def _constraint_values(constraints, values: Values, dtype):
    """Raw (unclipped) g(x) per constraint — used for the dual update."""
    vs = []
    for c in constraints:
        xs = tuple(values.at(k) for k in c.keys)
        vs.append(jnp.asarray(c.g(xs, c.params), dtype=dtype))
    return vs


def _violation(constraints, values: Values, dtype):
    """Clipped violation metric: inequalities count only when g > 0."""
    vs = []
    for c, g in zip(constraints, _constraint_values(constraints, values, dtype)):
        if isinstance(c, InequalityConstraint):
            g = jnp.maximum(g, 0.0)
        vs.append(g)
    return vs


def penalty_optimize(
    graph: NonlinearFactorGraph,
    constraints: Sequence,
    values: Values,
    params: Optional[PenaltyParams] = None,
):
    """Quadratic-penalty method: solve min f + mu/2||g||^2, mu increasing."""
    params = params or PenaltyParams()
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    mu = params.mu_initial
    duals = [jnp.zeros(c.dim, dtype=dtype) for c in constraints]
    result = None
    for _ in range(params.max_outer_iterations):
        aug = _augment(graph, constraints, mu, [0.0 * d for d in duals], dtype)
        result = optimizers.levenberg_marquardt(aug, values, params.inner)
        values = result.values
        viol = _violation(constraints, values, dtype)
        if max(float(jnp.max(jnp.abs(v))) for v in viol) < params.constraint_tol:
            break
        mu *= params.mu_rate
    return result


def augmented_lagrangian_optimize(
    graph: NonlinearFactorGraph,
    constraints: Sequence,
    values: Values,
    params: Optional[PenaltyParams] = None,
):
    """Augmented Lagrangian (method of multipliers).

    lambda_{k+1} = lambda_k + mu g(x_k); mu only grows when the violation
    stalls — the textbook scheme the reference's penalty utilities build.
    """
    params = params or PenaltyParams()
    dtype = jnp.float64 if jnp.zeros(()).dtype == jnp.float64 else jnp.float32
    mu = params.mu_initial
    duals = [jnp.zeros(c.dim, dtype=dtype) for c in constraints]
    prev_viol = None
    result = None
    for _ in range(params.max_outer_iterations):
        aug = _augment(graph, constraints, mu, duals, dtype)
        result = optimizers.levenberg_marquardt(aug, values, params.inner)
        values = result.values
        viol = _violation(constraints, values, dtype)
        max_v = max(float(jnp.max(jnp.abs(v))) for v in viol)
        if max_v < params.constraint_tol:
            break
        # Dual update uses the RAW g (not the clipped violation): for
        # inequalities lam <- max(lam + mu g, 0) must see g < 0 so a
        # multiplier on a constraint that became inactive decays back to 0
        # instead of penalizing inside the feasible region.
        raw = _constraint_values(constraints, values, dtype)
        new_duals = []
        for c, lam, g in zip(constraints, duals, raw):
            lam_new = lam + mu * g
            if isinstance(c, InequalityConstraint):
                lam_new = jnp.maximum(lam_new, 0.0)
            new_duals.append(lam_new)
        duals = new_duals
        if prev_viol is not None and max_v > 0.25 * prev_viol:
            mu *= params.mu_rate
        prev_viol = max_v
    return result
