"""NonlinearISAM: naive incremental wrapper with periodic full reordering.

Reference: gtsam/nonlinear/NonlinearISAM.{h,cpp} — maintains a GaussianISAM
over factors linearized at the stored linearization points and performs a
periodic full relinearization + reordering every `reorder_interval` updates.
Here the linear incremental engine is the planned supernodal solver; between
reorderings updates re-solve with frozen linearization points (matching the
reference, which only relinearizes at reorder time).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.linear import solve as linsolve


class NonlinearISAM:
    def __init__(self, reorder_interval: int = 1):
        self.reorder_interval = max(1, reorder_interval)
        self.factors = NonlinearFactorGraph()
        self.linearization_point = Values()
        self._delta: Optional[Dict[str, jnp.ndarray]] = None
        self._count = 0

    def update(self, new_factors: NonlinearFactorGraph, new_values: Values):
        new_factors._materialize()
        for b in new_factors.batches:
            self.factors.batches.append(b)
        # Capture the current best estimate of pre-existing variables while
        # _delta still matches the old variable set: the reference
        # NonlinearISAM relinearizes around the CURRENT solution
        # (linPoint + delta), not the stale linearization point
        # (gtsam/nonlinear/NonlinearISAM.cpp reorder_relinearize).
        est = self.linearization_point
        if self._delta is not None:
            est = self.linearization_point.retract(self._delta)
        for key in new_values.keys():
            t, v = new_values.type_of(key), new_values.at(key)
            if est is not self.linearization_point:
                est.insert(key, t, v)
            self.linearization_point.insert(key, t, v)
        self._count += 1
        self._delta = None
        if self._count % self.reorder_interval == 0:
            self.reorder_relinearize(est)
        else:
            # linear-only update at the frozen linearization point
            lg = self.factors.linearize(self.linearization_point)
            H, g = linsolve.assemble_dense(lg)
            x = linsolve.dense_solve(H, g, 1e-9)
            self._delta = linsolve.unflatten_delta(lg, x)

    def reorder_relinearize(self, seed: Optional[Values] = None):
        """Full relinearize: one GN pass re-centering the linearization,
        seeded from the current best estimate (not the stale lin point)."""
        res = optimizers.gauss_newton(
            self.factors,
            seed if seed is not None else self.estimate(),
            optimizers.OptimizerParams(max_iterations=1),
        )
        self.linearization_point = res.values
        self._delta = None

    def estimate(self) -> Values:
        if self._delta is None:
            return self.linearization_point
        return self.linearization_point.retract(self._delta)
