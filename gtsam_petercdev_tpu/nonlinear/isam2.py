"""ISAM2 — incremental smoothing and mapping on the planned supernodal engine.

Reference: gtsam/nonlinear/ISAM2.{h,cpp} (update: ISAM2.cpp:419-484,
relinearization marking :454-468, recalculate :117-363, wildfire
back-substitution ISAM2Clique.cpp:237).

TPU-native redesign (SURVEY §7 M5): the Bayes tree never exists as pointers.
State is (theta, delta, accumulated factor batches, EliminationPlan). Each
update:
  1. add new variables/factors (host bookkeeping),
  2. mark keys: new-factor keys + vars with |delta| > relinearize_threshold
     (ISAM2's gatherRelinearizeKeys),
  3. retract ONLY marked vars (Values::retractMasked semantics) and
     invalidate their factors' cached linearizations,
  4. re-linearize invalidated factor rows (one masked vmapped jacfwd per
     batch — rows are recomputed in place in the cached (A, b) arrays),
  5. re-eliminate and back-substitute with the planned batched kernels.

The elimination plan depends only on graph TOPOLOGY, so relinearization-only
updates reuse plan + compiled solver; topology changes re-plan (the analog of
ISAM2's recalculateBatch path — incremental plan surgery is a later
optimization; results are identical either way, matching the reference's
incremental-vs-batch equivalence contract, tests/testGaussianISAM2.cpp).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.inference import elimination
from gtsam_petercdev_tpu.nonlinear.factor_graph import (
    FactorBatch,
    NonlinearFactorGraph,
)
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass
class ISAM2Params:
    relinearize_threshold: float = 0.1
    relinearize_skip: int = 10
    enable_relinearization: bool = True
    wildfire_threshold: float = 0.0  # 0 = exact full back-substitution


@dataclass
class ISAM2Result:
    error_before: float = 0.0
    error_after: float = 0.0
    n_relinearized: int = 0
    n_new_factors: int = 0


class ISAM2:
    def __init__(self, params: Optional[ISAM2Params] = None):
        self.params = params or ISAM2Params()
        self.graph = NonlinearFactorGraph()
        self.theta = Values()  # linearization points
        self.delta: Dict[str, jnp.ndarray] = {}  # tangent update per type
        self._update_count = 0
        self._plan = None
        self._maps = None
        self._solve_fn = None
        self._lin: List[Any] = []  # cached (A tuple, b) per batch
        self._structure_dirty = True

    # -- public API ---------------------------------------------------------

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_theta: Optional[Values] = None,
    ) -> ISAM2Result:
        res = ISAM2Result()
        self._update_count += 1

        # 1. new variables
        if new_theta is not None:
            for key in new_theta.keys():
                t = new_theta.type_of(key)
                self.theta.insert(key, t, new_theta.at(key))
            for t in new_theta.types():
                n_new = len(new_theta.type_keys(t))
                dim = manifold.get(t).dim
                dtype = jax.tree_util.tree_leaves(new_theta.params(t))[0].dtype
                pad = jnp.zeros((n_new, dim), dtype=dtype)
                self.delta[t] = (
                    jnp.concatenate([self.delta[t], pad]) if t in self.delta else pad
                )

        # 2. new factors
        marked: set = set()
        if new_factors is not None:
            new_factors._materialize()
            for b in new_factors.batches:
                self.graph.batches.append(b)
                self._lin.append(None)
                res.n_new_factors += b.size
                marked.update(int(k) for k in b.keys.reshape(-1))
            if new_factors.batches:
                self._structure_dirty = True

        # 3. relinearization marking (gatherRelinearizeKeys)
        relin_keys: set = set()
        if (
            self.params.enable_relinearization
            and self._update_count % self.params.relinearize_skip == 0
        ):
            for t, dv in self.delta.items():
                if dv.shape[0] == 0:
                    continue
                mags = np.asarray(jnp.max(jnp.abs(dv), axis=1))
                rows = np.where(mags > self.params.relinearize_threshold)[0]
                keys_t = self.theta.type_keys(t)
                relin_keys.update(int(keys_t[r]) for r in rows)
        res.n_relinearized = len(relin_keys)

        # 4. retract marked vars only (retractMasked, Values.h:229)
        if relin_keys:
            masked_delta = {}
            for t, dv in self.delta.items():
                keys_t = self.theta.type_keys(t)
                mask = np.zeros(dv.shape[0], dtype=bool)
                for r, k in enumerate(keys_t):
                    if int(k) in relin_keys:
                        mask[r] = True
                masked_delta[t] = jnp.where(jnp.asarray(mask)[:, None], dv, 0.0)
            self.theta = self.theta.retract(masked_delta)
            self.delta = {
                t: jnp.where(
                    jnp.asarray(
                        np.array(
                            [int(k) in relin_keys for k in self.theta.type_keys(t)]
                        )
                    )[:, None],
                    0.0,
                    dv,
                )
                for t, dv in self.delta.items()
            }
            marked.update(relin_keys)

        # 5. relinearize invalidated batches (new or touching marked keys)
        for bi, batch in enumerate(self.graph.batches):
            if self._lin[bi] is None or (
                marked and any(int(k) in marked for k in batch.keys.reshape(-1))
            ):
                rows = self.graph._batch_terms(batch, self.theta)
                xs = self.graph._gather(self.theta, batch, rows)
                r_w, Js = self.graph._residual_and_jac(batch, xs)
                self._lin[bi] = (Js, -r_w, rows)

        # 6. (re)plan + solve
        self._ensure_plan()
        Ab = tuple((A, b) for (A, b, _rows) in self._lin)
        x = self._solve_fn(Ab, 0.0)
        t0 = self._types[0]
        self.delta = {t0: x}
        return res

    def calculate_estimate(self) -> Values:
        """theta ⊞ delta (lazy wildfire estimate, ISAM2.cpp:786-818)."""
        return self.theta.retract(self.delta)

    def error(self, values: Optional[Values] = None) -> float:
        return float(self.graph.error(values or self.calculate_estimate()))

    # -- internals ----------------------------------------------------------

    def _ensure_plan(self):
        types = self.theta.types()
        if len(types) != 1:
            raise NotImplementedError("ISAM2 v1: one uniform variable type")
        self._types = types
        t = types[0]
        d = manifold.get(t).dim
        n = len(self.theta.type_keys(t))
        if self._structure_dirty or self._plan is None or self._plan.n != n:
            structure = [
                (b.ftype.var_types, self._lin[bi][2])
                for bi, b in enumerate(self.graph.batches)
            ]
            plan = elimination.build_plan_for_graph(
                [(rows, t) for (_vt, rows) in structure], n, d
            )
            maps = elimination.build_numeric_maps(plan, structure)
            self._plan = plan
            self._maps = maps
            self._solve_fn = partial(elimination.multifrontal_solve, maps)
            self._structure_dirty = False
