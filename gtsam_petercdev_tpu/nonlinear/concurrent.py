"""Concurrent filtering and smoothing — the reference's two-solver design.

Reference: gtsam_unstable/nonlinear/ConcurrentFilteringAndSmoothing.{h,cpp}
(the synchronize() protocol), ConcurrentBatchFilter.{h,cpp},
ConcurrentBatchSmoother.{h,cpp}:

  * The FILTER owns the recent sliding window and runs at sensor rate.
  * The SMOOTHER owns the full history and refines in the background.
  * synchronize() exchanges information through the SEPARATOR (the boundary
    variables): the filter hands over out-of-lag states plus the factors
    fully supported on them, together with a summarized (marginal) factor
    of its remaining information on the separator; the smoother returns
    its own marginal on the separator, which the filter treats as a prior.

Double-counting is avoided exactly as in the reference: each side
summarizes ONLY its own factors, never the summarization it received from
the other side (ConcurrentBatchFilter.cpp marginalize /
ConcurrentBatchSmoother.cpp presync).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.fixed_lag import marginalize_keys
from gtsam_petercdev_tpu.nonlinear.values import Values


def _merge_graphs(*graphs: Optional[NonlinearFactorGraph]) -> NonlinearFactorGraph:
    out = NonlinearFactorGraph()
    for g in graphs:
        if g is None:
            continue
        g._materialize()
        out.batches.extend(g.batches)
    return out


def _summarize_onto(
    graph: NonlinearFactorGraph, values: Values, separator: Sequence[int]
) -> NonlinearFactorGraph:
    """Marginal of `graph` onto the separator keys as a container-factor
    graph (the reference's summarization via marginal factors)."""
    graph._materialize()
    sep = set(int(k) for k in separator)
    all_keys = set()
    for b in graph.batches:
        all_keys.update(int(k) for k in b.keys.reshape(-1))
    drop = sorted(all_keys - sep)
    if not drop:
        return _merge_graphs(graph)
    marg_graph, _ = marginalize_keys(graph, values, drop)
    return marg_graph


class ConcurrentBatchSmoother:
    """Full-history smoother half (ConcurrentBatchSmoother.h:40)."""

    def __init__(self, lm_params: Optional[optimizers.LMParams] = None):
        self.lm_params = lm_params or optimizers.LMParams(max_iterations=20)
        self.graph = NonlinearFactorGraph()
        self.values = Values()
        self.filter_summarization: Optional[NonlinearFactorGraph] = None
        self.separator: List[int] = []

    def update(self) -> optimizers.OptimizerResult:
        """Optimize history + the filter's summarized prior
        (ConcurrentBatchSmoother::update)."""
        full = _merge_graphs(self.graph, self.filter_summarization)
        if not full.batches or len(self.values) == 0:
            return optimizers.OptimizerResult(self.values, 0.0, 0, True)
        res = optimizers.levenberg_marquardt(full, self.values, self.lm_params)
        self.values = res.values
        return res

    def summarize(self) -> NonlinearFactorGraph:
        """Marginal of the smoother's OWN factors on the separator
        (getSmootherSummarizedFactors)."""
        if not self.separator:
            return NonlinearFactorGraph()
        return _summarize_onto(self.graph, self.values, self.separator)


class ConcurrentBatchFilter:
    """Sensor-rate filter half (ConcurrentBatchFilter.h:44)."""

    def __init__(self, lag: float, lm_params: Optional[optimizers.LMParams] = None):
        self.lag = float(lag)
        self.lm_params = lm_params or optimizers.LMParams(max_iterations=15)
        self.graph = NonlinearFactorGraph()
        self.values = Values()
        self.timestamps: Dict[int, float] = {}
        self.smoother_summarization: Optional[NonlinearFactorGraph] = None

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_values: Optional[Values] = None,
        timestamps: Optional[Dict[int, float]] = None,
    ) -> optimizers.OptimizerResult:
        if new_values is not None:
            for k in new_values.keys():
                self.values.insert(k, new_values.type_of(k), new_values.at(k))
        if timestamps:
            self.timestamps.update(
                {int(k): float(t) for k, t in timestamps.items()}
            )
        if new_factors is not None:
            new_factors._materialize()
            self.graph.batches.extend(new_factors.batches)
        full = _merge_graphs(self.graph, self.smoother_summarization)
        res = optimizers.levenberg_marquardt(full, self.values, self.lm_params)
        self.values = res.values
        return res


def synchronize(
    filter: ConcurrentBatchFilter, smoother: ConcurrentBatchSmoother
) -> None:
    """The ConcurrentFilteringAndSmoothing.h:synchronize exchange:

    1. The filter identifies out-of-lag keys and the separator (in-lag keys
       connected to them through moved factors).
    2. Factors fully supported on (old U separator) move to the smoother,
       together with the old keys' current estimates.
    3. The filter summarizes its REMAINING own factors onto the separator
       and sends that to the smoother; the old keys leave the filter.
    4. The smoother re-optimizes and returns its own separator marginal,
       which the filter holds as its prior.
    """
    filter.graph._materialize()
    current = max(filter.timestamps.values()) if filter.timestamps else 0.0
    old = {
        k for k, t in filter.timestamps.items() if t < current - filter.lag
    }
    old = {k for k in old if k in filter.values}
    if not old:
        # still run the smoother refresh + prior exchange
        smoother.filter_summarization = _summarize_onto(
            filter.graph, filter.values, smoother.separator
        ) if smoother.separator else None
        smoother.update()
        if smoother.separator:
            filter.smoother_summarization = smoother.summarize()
        return

    # factors fully supported on old U (anything): a factor moves iff it
    # touches at least one old key; its non-old keys become separator
    move_rows: List[Tuple] = []
    keep = NonlinearFactorGraph()
    separator: List[int] = []
    seen = set()
    for b in filter.graph.batches:
        touches = np.array(
            [any(int(k) in old for k in row) for row in b.keys], dtype=bool
        )
        if touches.any():
            rows = np.where(touches)[0]
            move_rows.append((b, rows))
            for r in rows:
                for k in b.keys[r]:
                    k = int(k)
                    if k not in old and k not in seen:
                        seen.add(k)
                        separator.append(k)
        if (~touches).any():
            rows = np.where(~touches)[0]
            keep.add_batch(
                b.ftype,
                b.keys[rows],
                jax.tree_util.tree_map(lambda a: a[rows], b.params),
                b.sqrt_info[rows],
                b.robust,
                b.sign,
                constrained_mask=(
                    b.constrained_mask[rows]
                    if b.constrained_mask is not None
                    else None
                ),
            )

    # move factors + values into the smoother
    for b, rows in move_rows:
        smoother.graph.add_batch(
            b.ftype,
            b.keys[rows],
            jax.tree_util.tree_map(lambda a: a[rows], b.params),
            b.sqrt_info[rows],
            b.robust,
            b.sign,
            constrained_mask=(
                b.constrained_mask[rows]
                if b.constrained_mask is not None
                else None
            ),
        )
    for k in sorted(old) + separator:
        if k not in smoother.values:
            smoother.values.insert(
                k, filter.values.type_of(k), filter.values.at(k)
            )
    # the separator is the CURRENT boundary: previous separator keys that
    # just went out of lag are now smoother-interior variables
    smoother.separator = sorted(
        (set(smoother.separator) | set(separator)) - old
    )

    # the filter keeps only its remaining factors; summarize them for the
    # smoother (its view of the filter's info on the separator)
    filter.graph = keep
    smoother.filter_summarization = _summarize_onto(
        keep, filter.values, smoother.separator
    )

    # drop old keys from the filter state
    new_values = Values()
    for k in filter.values.keys():
        if int(k) not in old:
            new_values.insert(
                k, filter.values.type_of(k), filter.values.at(k)
            )
    filter.values = new_values
    for k in old:
        filter.timestamps.pop(k, None)

    # smoother refines and hands back its separator marginal
    smoother.update()
    filter.smoother_summarization = smoother.summarize()
    # adopt the smoother's (better) separator estimates
    for k in smoother.separator:
        if k in filter.values:
            filter.values.update(k, smoother.values.at(k))


# ---------------------------------------------------------------------------
# incremental variants (gtsam_unstable/nonlinear/ConcurrentIncrementalFilter.h:30,
# ConcurrentIncrementalSmoother.h): the realtime configuration — the filter
# runs as an iSAM2 instance, the smoother refines incrementally; synchronize
# exchanges the same separator summaries as the batch pair.
# ---------------------------------------------------------------------------

from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params  # noqa: E402


class ConcurrentIncrementalSmoother:
    """Background smoother running on the incremental Bayes-tree engine.

    Between synchronizations, updates are true iSAM2 updates; at each
    synchronize the filter's summarized prior is swapped via factor removal
    (ISAM2.remove_factors) instead of a batch rebuild."""

    def __init__(self, isam_params: Optional[ISAM2Params] = None):
        self.isam = ISAM2(isam_params or ISAM2Params(relinearize_skip=1))
        self.graph = NonlinearFactorGraph()  # OWN history factors
        self.separator: List[int] = []
        self._summ_units: List[Tuple[int, int]] = []

    @property
    def values(self) -> Values:
        return self.isam.calculate_estimate()

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_values: Optional[Values] = None,
        new_summarization: Optional[NonlinearFactorGraph] = None,
    ) -> None:
        if self._summ_units and new_summarization is not None:
            self.isam.remove_factors(self._summ_units)
            self._summ_units = []
        if new_factors is not None:
            new_factors._materialize()
        if new_summarization is not None:
            new_summarization._materialize()
        if new_factors is not None and new_factors.batches:
            self.graph._materialize()
            self.graph.batches.extend(new_factors.batches)
            self.isam.update(new_factors, new_values)
        elif new_values is not None and len(new_values):
            self.isam.update(None, new_values)
        if new_summarization is not None and new_summarization.batches:
            res = self.isam.update(new_summarization, None)
            self._summ_units = list(res.new_factor_units)
        for _ in range(2):
            self.isam.update(force_relinearize=True)

    def summarize(self) -> NonlinearFactorGraph:
        """Marginal of the smoother's OWN factors on the separator."""
        if not self.separator:
            return NonlinearFactorGraph()
        return _summarize_onto(self.graph, self.values, self.separator)


class ConcurrentIncrementalFilter:
    """Sensor-rate filter running as iSAM2 (ConcurrentIncrementalFilter.h:30).

    Moved-out factors leave the tree by unit removal; moved-out variables
    are dropped by zero-information marginalization; the smoother's
    separator marginal is held as a removable prior."""

    def __init__(
        self,
        lag: float,
        isam_params: Optional[ISAM2Params] = None,
        extra_iterations: int = 2,
    ):
        self.lag = float(lag)
        self.isam = ISAM2(isam_params or ISAM2Params(relinearize_skip=1))
        self.extra_iterations = int(extra_iterations)
        self.graph = NonlinearFactorGraph()
        self._batch_units: List[List[Tuple[int, int]]] = []
        self.timestamps: Dict[int, float] = {}
        self._prior_units: List[Tuple[int, int]] = []

    @property
    def values(self) -> Values:
        return self.isam.calculate_estimate()

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_values: Optional[Values] = None,
        timestamps: Optional[Dict[int, float]] = None,
    ) -> None:
        if timestamps:
            self.timestamps.update(
                {int(k): float(t) for k, t in timestamps.items()}
            )
        if new_factors is not None:
            new_factors._materialize()
        if new_factors is not None and new_factors.batches:
            res = self.isam.update(new_factors, new_values)
            units = list(res.new_factor_units)
            self.graph._materialize()
            off = 0
            for b in new_factors.batches:
                self.graph.batches.append(b)
                self._batch_units.append(units[off : off + b.size])
                off += b.size
        elif new_values is not None and len(new_values):
            self.isam.update(None, new_values)
        # extra relinearized sweeps: the batch filter iterates LM to
        # convergence each update; a couple of forced iSAM2 passes close
        # most of the nonlinear gap at window sizes
        for _ in range(self.extra_iterations):
            self.isam.update(force_relinearize=True)


def synchronize_incremental(
    filter: ConcurrentIncrementalFilter,
    smoother: ConcurrentIncrementalSmoother,
) -> None:
    """The synchronize() exchange for the incremental pair — same separator
    protocol as the batch pair, executed with tree surgery instead of batch
    re-solves."""
    filter.graph._materialize()
    est = filter.values
    current = max(filter.timestamps.values()) if filter.timestamps else 0.0
    old = {
        k for k, t in filter.timestamps.items() if t < current - filter.lag
    }
    old = {k for k in old if k in est}
    if not old:
        if smoother.separator:
            smoother.update(
                new_summarization=_summarize_onto(
                    filter.graph, est, smoother.separator
                )
            )
            _install_smoother_prior(filter, smoother)
        return

    # split the filter's factors: moved iff touching an old key
    move_graph = NonlinearFactorGraph()
    keep = NonlinearFactorGraph()
    keep_units: List[List[Tuple[int, int]]] = []
    moved_units: List[Tuple[int, int]] = []
    separator: List[int] = []
    seen = set()
    for b, units in zip(filter.graph.batches, filter._batch_units):
        touches = np.array(
            [any(int(k) in old for k in row) for row in b.keys], dtype=bool
        )
        rows = np.where(touches)[0]
        if len(rows):
            move_graph.add_batch(
                b.ftype,
                b.keys[rows],
                jax.tree_util.tree_map(lambda a: a[rows], b.params),
                b.sqrt_info[rows],
                b.robust,
                b.sign,
                constrained_mask=(
                    b.constrained_mask[rows]
                    if b.constrained_mask is not None
                    else None
                ),
            )
            moved_units.extend(units[r] for r in rows)
            for r in rows:
                for k in b.keys[r]:
                    k = int(k)
                    if k not in old and k not in seen:
                        seen.add(k)
                        separator.append(k)
        krows = np.where(~touches)[0]
        if len(krows):
            keep.add_batch(
                b.ftype,
                b.keys[krows],
                jax.tree_util.tree_map(lambda a: a[krows], b.params),
                b.sqrt_info[krows],
                b.robust,
                b.sign,
                constrained_mask=(
                    b.constrained_mask[krows]
                    if b.constrained_mask is not None
                    else None
                ),
            )
            keep_units.append([units[r] for r in krows])

    # values moving to the smoother (old + separator estimates)
    mv = Values()
    sm_est = smoother.isam._engine is not None and smoother.values or Values()
    for k in sorted(old) + separator:
        if k not in sm_est and k in est:
            mv.insert(k, est.type_of(k), est.at(k))

    smoother.separator = sorted(
        set(separator) | (set(smoother.separator) - old)
    )

    # filter surgery: moved info out, old vars dropped (zero-information
    # marginalization), then the refreshed smoother prior back in
    filter.isam.remove_factors(moved_units)
    # the moved keys' information was excised above (it now lives in the
    # smoother); this marginalization only DROPS the variables — no
    # marginal message, and crucially the separator must NOT become fixed
    filter.isam.marginalize_leaves(sorted(old), keep_messages=False)
    filter.graph = keep
    filter._batch_units = keep_units
    for k in old:
        filter.timestamps.pop(k, None)

    filter_summ = _summarize_onto(keep, est, smoother.separator)
    smoother.update(move_graph, mv, new_summarization=filter_summ)
    _install_smoother_prior(filter, smoother)


def _install_smoother_prior(
    filter: ConcurrentIncrementalFilter,
    smoother: ConcurrentIncrementalSmoother,
) -> None:
    if filter._prior_units:
        filter.isam.remove_factors(filter._prior_units)
        filter._prior_units = []
    summ = smoother.summarize()
    if summ.batches:
        res = filter.isam.update(summ, None)
        filter._prior_units = list(res.new_factor_units)
