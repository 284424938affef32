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
