"""Fixed-lag smoothing with true marginalization.

Reference: gtsam/nonlinear/BatchFixedLagSmoother.{h,cpp}:37 — maintain a
sliding window: each update adds factors/values, runs LM, then marginalizes
every variable whose timestamp fell out of the lag. Marginalization follows
the reference recipe (BatchFixedLagSmoother::marginalize): linearize the
factors touching the dropped keys, Schur-complement the dropped blocks out
of that sub-system, and re-insert the result as a linear factor on the
boundary keys anchored at the current linearization point (the
LinearContainerFactor mechanism, nonlinear/LinearContainerFactor.h).

TPU-native: the Schur complement is one dense solve over the (small)
dropped+boundary sub-problem; the marginal enters the graph as a regular
FactorType whose residual is sqrtH * local(x0, x) - rhs, so all downstream
machinery (batched linearization, any solver) applies unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


def linear_container_factor(var_types: Tuple[str, ...], total_dim: int) -> FactorType:
    """A Gaussian factor frozen in the tangent space at anchor values x0
    (LinearContainerFactor.h): residual = sqrtH @ concat(local(x0_k, x_k)) - rhs.
    params = (x0 tuple pytree, sqrtH [D, D], rhs [D])."""

    locals_ = [manifold.get(t).local for t in var_types]

    def residual(xs, params):
        x0s, sqrtH, rhs = params
        deltas = [locals_[k](x0s[k], xs[k]) for k in range(len(xs))]
        d = jnp.concatenate(deltas)
        return sqrtH @ d - rhs

    return FactorType(
        name=f"LinearContainer[{','.join(var_types)}]{total_dim}",
        var_types=var_types,
        resid_dim=total_dim,
        residual=residual,
    )


def marginalize_keys(
    graph: NonlinearFactorGraph,
    values: Values,
    drop_keys: Sequence[int],
) -> Tuple[NonlinearFactorGraph, Values]:
    """Return (new_graph, new_values) with `drop_keys` marginalized out.

    Follows BatchFixedLagSmoother::marginalize: only factors touching a
    dropped key are removed; their information is Schur-complemented onto
    the boundary keys and re-added as one linear container factor.
    """
    graph._materialize()
    values._materialize()
    drop = set(int(k) for k in drop_keys)

    # split factor batches into keep / remove (row-wise)
    keep_graph = NonlinearFactorGraph()
    removed: List[Tuple] = []  # (batch, row_mask)
    for b in graph.batches:
        touches = np.array(
            [any(int(k) in drop for k in row) for row in b.keys], dtype=bool
        )
        if not touches.any():
            keep_graph.batches.append(b)
            continue
        if (~touches).any():
            keep_rows = np.where(~touches)[0]
            keep_graph.add_batch(
                b.ftype,
                b.keys[keep_rows],
                jax.tree_util.tree_map(lambda a: a[keep_rows], b.params),
                b.sqrt_info[keep_rows],
                b.robust,
            )
        rm_rows = np.where(touches)[0]
        removed.append((b, rm_rows))

    # boundary keys: non-dropped keys of removed factors
    boundary: List[int] = []
    seen = set()
    for b, rows in removed:
        for r in rows:
            for k in b.keys[r]:
                k = int(k)
                if k not in drop and k not in seen:
                    seen.add(k)
                    boundary.append(k)

    # build the removed-subgraph over (dropped + boundary) and linearize
    sub = NonlinearFactorGraph()
    for b, rows in removed:
        sub.add_batch(
            b.ftype,
            b.keys[rows],
            jax.tree_util.tree_map(lambda a: a[rows], b.params),
            b.sqrt_info[rows],
            b.robust,
        )
    sub_keys = sorted(drop) + boundary
    sub_values = Values()
    for k in sub_keys:
        sub_values.insert(k, values.type_of(k), values.at(k))
    lg = sub.linearize(sub_values)
    H, g = linsolve.assemble_dense(lg)

    # index maps: offsets within the dense sub-system
    off, D = linsolve.offsets(lg)
    def span(key):
        t = sub_values.type_of(key)
        row = sub_values.row_of(key)
        d = manifold.get(t).dim
        s = off[t] + row * d
        return list(range(s, s + d))

    drop_idx = np.concatenate([span(k) for k in sorted(drop)]) if drop else np.zeros(0, int)
    bnd_idx = np.concatenate([span(k) for k in boundary]) if boundary else np.zeros(0, int)

    H = np.asarray(H)
    g = np.asarray(g)
    if len(bnd_idx):
        Hoo = H[np.ix_(drop_idx, drop_idx)] + 1e-9 * np.eye(len(drop_idx))
        Hob = H[np.ix_(drop_idx, bnd_idx)]
        Hbb = H[np.ix_(bnd_idx, bnd_idx)]
        go = g[drop_idx]
        gb = g[bnd_idx]
        Hoo_inv_Hob = np.linalg.solve(Hoo, Hob)
        H_marg = Hbb - Hob.T @ Hoo_inv_Hob
        g_marg = gb - Hoo_inv_Hob.T @ go
        # convert to sqrt form: residual = sqrtH d - rhs, H = sqrtH^T sqrtH,
        # g = sqrtH^T rhs
        w, V = np.linalg.eigh(0.5 * (H_marg + H_marg.T))
        w = np.clip(w, 0.0, None)
        sqrtH = (V * np.sqrt(w)).T  # [D, D]
        # rhs from least squares (pinv handles the PSD null space)
        rhs = np.linalg.pinv(sqrtH.T) @ g_marg
        var_types = tuple(values.type_of(k) for k in boundary)
        Db = len(bnd_idx)
        ft = linear_container_factor(var_types, Db)
        x0s = tuple(values.at(k) for k in boundary)
        keep_graph.add(
            ft,
            boundary,
            (x0s, jnp.asarray(sqrtH), jnp.asarray(rhs)),
            jnp.eye(Db, dtype=jnp.asarray(H).dtype),
        )
    keep_graph._materialize()

    # rebuild values without dropped keys
    new_values = Values()
    for k in values.keys():
        if int(k) not in drop:
            new_values.insert(k, values.type_of(k), values.at(k))
    return keep_graph, new_values


@dataclass
class FixedLagSmootherResult:
    values: Values
    error: float
    iterations: int
    marginalized: List[int] = field(default_factory=list)


class BatchFixedLagSmoother:
    """Sliding-window smoother (BatchFixedLagSmoother.h:37)."""

    def __init__(self, lag: float, lm_params: Optional[optimizers.LMParams] = None):
        self.lag = float(lag)
        self.lm_params = lm_params or optimizers.LMParams(max_iterations=10)
        self.graph = NonlinearFactorGraph()
        self.values = Values()
        self.timestamps: Dict[int, float] = {}

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_values: Optional[Values] = None,
        timestamps: Optional[Dict[int, float]] = None,
    ) -> FixedLagSmootherResult:
        if new_values is not None:
            for k in new_values.keys():
                self.values.insert(k, new_values.type_of(k), new_values.at(k))
        if timestamps:
            self.timestamps.update({int(k): float(t) for k, t in timestamps.items()})
        if new_factors is not None:
            new_factors._materialize()
            self.graph.batches.extend(new_factors.batches)

        res = optimizers.levenberg_marquardt(self.graph, self.values, self.lm_params)
        self.values = res.values

        # marginalize out-of-lag variables
        current = max(self.timestamps.values()) if self.timestamps else 0.0
        old = [k for k, t in self.timestamps.items() if t < current - self.lag]
        if old:
            self.graph, self.values = marginalize_keys(self.graph, self.values, old)
            for k in old:
                self.timestamps.pop(k, None)
        return FixedLagSmootherResult(self.values, res.error, res.iterations, old)

    def calculate_estimate(self) -> Values:
        return self.values


class IncrementalFixedLagSmoother:
    """Fixed-lag smoothing on the incremental Bayes-tree engine.

    Reference: gtsam_unstable/nonlinear/IncrementalFixedLagSmoother.{h,cpp}:42
    — an ISAM2 whose out-of-lag variables are marginalized out of the tree
    each update instead of re-solving a batch window. The recipe:

      1. isam.update(new_factors, new_theta) — incremental re-elimination.
      2. Keys with timestamp < t_latest - lag are marginalized via
         ISAM2.marginalizeLeaves: the engine re-eliminates with those keys
         constrained FIRST (leaf-most) and merge-barred, then converts their
         cliques' cached separator messages into persistent Gaussian
         marginal factors (the LinearContainerFactor analog). Scope
         variables of those marginals are pinned against relinearization
         (fixedVariables_), so the frozen messages stay valid.

    Per-step cost is bounded by the lag window: the tree never grows beyond
    the live variables, and steady-state updates reuse warm jit caches
    (capacity-padded shapes — see nonlinear/isam2.py).
    """

    def __init__(
        self,
        lag: float,
        isam_params: Optional["ISAM2Params"] = None,
    ):
        from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params

        self.lag = float(lag)
        self.isam = ISAM2(isam_params or ISAM2Params())
        self.timestamps: Dict[int, float] = {}
        self._deferred: List[int] = []  # keys that weren't cleanly leaf-pure

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_values: Optional[Values] = None,
        timestamps: Optional[Dict[int, float]] = None,
    ) -> FixedLagSmootherResult:
        if timestamps:
            self.timestamps.update(
                {int(k): float(t) for k, t in timestamps.items()}
            )
        res = self.isam.update(new_factors, new_values)

        current = max(self.timestamps.values()) if self.timestamps else 0.0
        old = sorted(
            k for k, t in self.timestamps.items() if t < current - self.lag
        )
        old = self._deferred + [k for k in old if k not in self._deferred]
        marginalized: List[int] = []
        if old:
            try:
                self.isam.marginalize_leaves(old)
                marginalized = old
                self._deferred = []
            except RuntimeError:
                # a key wasn't leaf-pure this round (e.g. a brand-new loop
                # factor straddles the boundary); retry one-by-one so the
                # clean ones still leave, defer the rest to the next update
                self._deferred = []
                for k in old:
                    try:
                        self.isam.marginalize_leaves([k])
                        marginalized.append(k)
                    except RuntimeError:
                        self._deferred.append(k)
            for k in marginalized:
                self.timestamps.pop(k, None)
        est = self.isam.calculate_estimate()
        return FixedLagSmootherResult(est, -1.0, 1, marginalized)

    def calculate_estimate(self) -> Values:
        return self.isam.calculate_estimate()
