"""Graduated Non-Convexity robust optimization.

Reference: gtsam/nonlinear/GncOptimizer.h:183-320 + GncParams.h — an outer
loop around GN/LM that anneals a surrogate robust cost (TLS or
Geman-McClure) via the control parameter mu, recomputing per-factor weights
and re-solving the weighted least-squares problem each round; the inlier
threshold barcSq comes from the chi-squared quantile
(internal/ChiSquaredInverse.h).

TPU-native: per-factor weights are a device array pytree passed INTO the
jitted weighted-assembly function (not baked into closures), so the anneal
loop never recompiles. The weight updates are the closed-form TLS/GM rules
evaluated on the whole factor batch at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


def chi_squared_quantile(dof: float, alpha: float) -> float:
    """Inverse chi-squared CDF (the cephes-backed ChiSquaredInverse analog,
    gtsam/nonlinear/internal/ChiSquaredInverse.h). Pure host computation —
    this is setup-time scalar work, so no device round trips."""
    from scipy.stats import chi2

    return float(chi2.ppf(alpha, dof))


@dataclass
class GncParams:
    loss_type: str = "tls"  # "tls" | "gm"
    max_iterations: int = 100  # outer GNC iterations
    mu_step: float = 1.4
    relative_cost_tol: float = 1e-5
    weights_tol: float = 1e-4
    alpha: float = 0.99  # chi-squared inlier quantile
    barc_sq: Optional[float] = None  # override the chi2-derived threshold
    known_inliers: Dict[int, np.ndarray] = field(default_factory=dict)
    # known_inliers[batch_index] = bool [N] mask of factors pinned to w=1
    inner: optimizers.OptimizerParams = field(
        default_factory=lambda: optimizers.OptimizerParams(max_iterations=10)
    )
    verbose: bool = False


@dataclass
class GncResult:
    values: Values
    weights: List[jnp.ndarray]  # per batch [N] final weights
    inliers: List[np.ndarray]  # per batch [N] bool (weight > 0.5)
    iterations: int
    error: float


def _factor_sq_residuals(graph: NonlinearFactorGraph, values: Values):
    """Per-factor whitened squared residual norms r2, per batch."""
    out = []
    for batch in graph.batches:
        rows = graph._batch_terms(batch, values)
        xs = graph._gather(values, batch, rows)

        def single(xs_single, params, R):
            return R @ batch.ftype.residual(xs_single, params)

        r_w = jax.vmap(single)(xs, batch.params, batch.sqrt_info)
        out.append(jnp.sum(r_w * r_w, axis=-1))
    return out


def _weighted_assemble(graph: NonlinearFactorGraph, values: Values, weights):
    """Dense (H, g) with each factor's rows scaled by sqrt(w)."""
    lg = graph.linearize(values)
    for i, lb in enumerate(lg.batches):
        sw = jnp.sqrt(jnp.maximum(weights[i], 0.0))[:, None]
        lg.batches[i] = type(lb)(
            var_types=lb.var_types,
            rows=lb.rows,
            A=tuple(Ak * sw[..., None] for Ak in lb.A),
            b=lb.b * sw,
            sign=lb.sign,
        )
    return linsolve.assemble_dense(lg)


def _weighted_error(graph: NonlinearFactorGraph, values: Values, weights):
    r2s = _factor_sq_residuals(graph, values)
    return sum(
        graph.batches[i].sign * 0.5 * jnp.sum(weights[i] * r2)
        for i, r2 in enumerate(r2s)
    )


def _update_weights_tls(r2, mu, barc_sq):
    upper = (mu + 1.0) / mu * barc_sq
    lower = mu / (mu + 1.0) * barc_sq
    mid = jnp.sqrt(barc_sq * mu * (mu + 1.0) / jnp.maximum(r2, 1e-30)) - mu
    return jnp.where(r2 >= upper, 0.0, jnp.where(r2 <= lower, 1.0, jnp.clip(mid, 0.0, 1.0)))


def _update_weights_gm(r2, mu, barc_sq):
    w = (mu * barc_sq) / (r2 + mu * barc_sq)
    return w * w


def gnc(
    graph: NonlinearFactorGraph,
    values: Values,
    params: Optional[GncParams] = None,
) -> GncResult:
    params = params or GncParams()
    graph._materialize()
    values._materialize()

    # per-batch inlier thresholds from factor dimension
    barcs = []
    for batch in graph.batches:
        if params.barc_sq is not None:
            barcs.append(params.barc_sq)
        else:
            barcs.append(chi_squared_quantile(batch.ftype.resid_dim, params.alpha))

    weighted_err_fn = jax.jit(lambda v, w: _weighted_error(graph, v, w))
    assemble_fn = jax.jit(lambda v, w: _weighted_assemble(graph, v, w))
    r2_fn = jax.jit(lambda v: _factor_sq_residuals(graph, v))

    @jax.jit
    def solve_fn(H, g):
        return linsolve.dense_solve(H, g, 1e-9)

    @jax.jit
    def retract_fn(v, delta):
        return v.retract(delta)

    counts = {
        t: jax.tree_util.tree_leaves(values.params(t))[0].shape[0]
        for t in values.types()
    }

    def inner_solve(v, w):
        """Weighted GN iterations at fixed weights (the reference's
        baseOptimizer step, GncOptimizer.h:250)."""
        err = float(weighted_err_fn(v, w))
        for _ in range(params.inner.max_iterations):
            H, g = assemble_fn(v, w)
            x = solve_fn(H, g)
            delta = optimizers._unflatten(counts, x)
            v_new = retract_fn(v, delta)
            new_err = float(weighted_err_fn(v_new, w))
            if not np.isfinite(new_err) or new_err > err:
                break
            v = v_new
            if optimizers.check_convergence(params.inner, err, new_err):
                err = new_err
                break
            err = new_err
        return v, err

    # initial solve at unit weights
    weights = [jnp.ones((b.size,), dtype=jnp.float64) for b in graph.batches]
    values, cost = inner_solve(values, weights)

    # initialize mu from the max residual (GncOptimizer::initializeMu)
    r2s = r2_fn(values)
    r2max = max(float(jnp.max(r2)) for r2 in r2s) if r2s else 1.0
    if params.loss_type == "tls":
        denom = 2.0 * r2max / max(barcs) - 1.0
        mu = 1e-6 if denom <= 0 else 1.0 / denom
        upd = _update_weights_tls
    else:
        mu = max(1.0, 2.0 * r2max / max(barcs))
        upd = _update_weights_gm

    prev_cost = cost
    it = 0
    for it in range(1, params.max_iterations + 1):
        r2s = r2_fn(values)
        new_weights = []
        for i, r2 in enumerate(r2s):
            w = upd(r2, jnp.asarray(mu), jnp.asarray(barcs[i]))
            pin = params.known_inliers.get(i)
            if pin is not None:
                w = jnp.where(jnp.asarray(pin), 1.0, w)
            new_weights.append(w)

        weights = new_weights
        values, cost = inner_solve(values, weights)
        if params.verbose:
            print(f"GNC iter {it}: mu={mu:.3e} cost={cost:.6e}")

        # convergence (GncOptimizer::checkConvergence): GM -> mu annealed to
        # 1; TLS -> all weights binary (checkWeightsConvergence). A plain
        # cost/weight-delta test would fire spuriously at iteration 1 while
        # the anneal has not yet begun.
        if params.loss_type == "gm":
            if mu <= 1.0 + 1e-9:
                break
        else:
            binary = all(
                float(jnp.max(jnp.abs(w - jnp.round(w)))) < params.weights_tol
                for w in weights
            )
            if binary and it > 1:
                break
        prev_cost = cost
        mu = mu * params.mu_step if params.loss_type == "tls" else max(1.0, mu / params.mu_step)

    inliers = [np.asarray(w) > 0.5 for w in weights]
    return GncResult(values, weights, inliers, it, float(cost))
