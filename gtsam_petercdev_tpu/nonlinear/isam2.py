"""ISAM2 — true incremental smoothing and mapping on the Bayes-tree engine.

Reference: gtsam/nonlinear/ISAM2.{h,cpp} (update ISAM2.cpp:419-484,
relinearization marking :454-468, recalculate :117-363, marginalizeLeaves
:487-724, wildfire back-substitution ISAM2Clique.cpp:237).

The heavy lifting lives in inference/incremental.py (pool-backed Bayes tree,
removeTop/orphan surgery, argument-indexed batched kernels, wildfire). This
wrapper owns the NONLINEAR side exactly as the reference's ISAM2 does:

  1. addVariables: new theta entries get global ids (gids) and engine rows.
  2. pushBackFactors: new factors are linearized once and cached in the
     engine's device factor stores (cacheLinearizedFactors semantics).
  3. gatherRelinearizeKeys: every `relinearize_skip` updates, vars with
     |delta| > relinearize_threshold are marked.
  4. retractMasked (Values.h:229): ONLY marked vars move their linearization
     point; their delta zeroes; every cached factor row touching them is
     re-linearized in place (row-granular, padded-jit — no full re-linearize).
  5. engine.update re-eliminates the affected top and wildfire-solves delta.

Incremental-vs-batch contract (tests/testGaussianISAM2.cpp): with
wildfire_threshold=0 the delta equals a from-scratch batch solve of the same
linearized system to solver precision.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.inference.incremental import IncrementalEngine, _pad
from gtsam_petercdev_tpu.nonlinear.factor_graph import (
    FactorBatch,
    NonlinearFactorGraph,
    residual_and_jac,
)
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass
class ISAM2Params:
    relinearize_threshold: float = 0.1
    relinearize_skip: int = 10
    enable_relinearization: bool = True
    # 0.0 = exact full back-substitution; reference default 0.001
    # (ISAM2Params.h optimizationParams wildfireThreshold)
    wildfire_threshold: float = 0.001
    evaluate_error: bool = False  # fill ISAM2Result.error_* (costs O(graph))
    block_dim: Optional[int] = None  # pad dim; default max dim of first types


@dataclass
class ISAM2Result:
    error_before: Optional[float] = None
    error_after: Optional[float] = None
    n_relinearized: int = 0
    n_new_factors: int = 0
    n_affected_cliques: int = 0
    n_orphans: int = 0
    n_reeliminated: int = 0
    wildfire_rounds: int = 0
    bad_pivots: Any = 0
    n_cliques: int = 0


@lru_cache(maxsize=None)
def _lin_rows_jit(ftype, robust, N, dtype_str):
    def f(xs, params, sqrt_info):
        r_w, Js = residual_and_jac(ftype, robust, xs, params, sqrt_info)
        return Js, -r_w

    return jax.jit(f)


class _Group:
    """Host mirror of one engine factor group (for relinearization/error)."""

    __slots__ = ("ftype", "robust", "sign", "params", "sqrt_info", "keys")

    def __init__(self, ftype, robust, sign):
        self.ftype = ftype
        self.robust = robust
        self.sign = sign
        self.params: List[Any] = []  # per row numpy pytree
        self.sqrt_info: List[np.ndarray] = []
        self.keys: List[Tuple[int, ...]] = []


class ISAM2:
    def __init__(self, params: Optional[ISAM2Params] = None):
        self.params = params or ISAM2Params()
        self.theta = Values()
        self._engine: Optional[IncrementalEngine] = None
        self._key_gid: Dict[int, int] = {}
        self._gid_key: List[int] = []
        self._gid_type: List[str] = []
        self._groups: List[_Group] = []
        self._marginalized: Set[int] = set()  # keys removed from the tree
        self._update_count = 0

    # -- public API -----------------------------------------------------------

    def update(
        self,
        new_factors: Optional[NonlinearFactorGraph] = None,
        new_theta: Optional[Values] = None,
        force_relinearize: bool = False,
    ) -> ISAM2Result:
        res = ISAM2Result()
        self._update_count += 1
        eng = self._ensure_engine(new_theta)

        # 1. add variables
        new_gids: List[int] = []
        if new_theta is not None:
            dims = []
            for key in new_theta.keys():
                t = new_theta.type_of(key)
                self.theta.insert(key, t, new_theta.at(key))
                gid = len(self._gid_key)
                self._key_gid[int(key)] = gid
                self._gid_key.append(int(key))
                self._gid_type.append(t)
                dims.append(manifold.get(t).dim)
                new_gids.append(gid)
            eng.add_variables(dims)

        # 2. add factors (linearize once, cache in the engine)
        marked: Set[int] = set()
        new_units: List[Tuple[int, int]] = []
        if new_factors is not None:
            new_factors._materialize()
            for b in new_factors.batches:
                g = self._group_for(b)
                grp = self._groups[g]
                n0 = len(grp.keys)
                for i in range(b.size):
                    grp.params.append(
                        jax.tree_util.tree_map(lambda a, i=i: a[i], b.params)
                    )
                    grp.sqrt_info.append(b.sqrt_info[i])
                    grp.keys.append(tuple(int(k) for k in b.keys[i]))
                gids = np.asarray(
                    [[self._key_gid[int(k)] for k in row] for row in b.keys],
                    dtype=np.int64,
                )
                A, bb = self._linearize_rows(g, list(range(n0, n0 + b.size)))
                rows = eng.add_factors(g, gids, A, bb)
                new_units.extend((g, r) for r in rows)
                res.n_new_factors += b.size
                marked.update(int(v) for v in gids.reshape(-1))
        new_gid_set = set(new_gids)
        marked -= new_gid_set  # new keys go through new_keys (ordered last)

        # 3. relinearization marking (gatherRelinearizeKeys, ISAM2.cpp:454)
        relin: Set[int] = set()
        if self.params.enable_relinearization and (
            force_relinearize
            or self._update_count % self.params.relinearize_skip == 0
        ):
            md = eng.var_max_delta()
            thr = self.params.relinearize_threshold
            for gid in np.where(md > thr)[0]:
                gid = int(gid)
                if gid in eng.var_clique:
                    relin.add(gid)
        res.n_relinearized = len(relin)

        # 4. retractMasked + row-granular relinearization
        if relin:
            self._retract_masked(relin)
            eng.zero_delta_rows(sorted(relin))
            touched: Dict[int, Set[int]] = {}
            for gid in relin:
                for (g, r) in eng.var_factors.get(gid, ()):
                    touched.setdefault(g, set()).add(r)
            for g, rows in touched.items():
                rows = sorted(rows)
                A, bb = self._linearize_rows(g, rows)
                eng.set_factor_rows(g, rows, A, bb)

        if self.params.evaluate_error:
            res.error_before = self.error(self.theta)

        # 5. re-eliminate the affected top + wildfire
        stats = eng.update(
            new_keys=new_gids,
            new_fac_units=new_units,
            marked=marked,
            relin=relin,
            wildfire_threshold=self.params.wildfire_threshold,
        )
        res.n_affected_cliques = stats.get("n_affected_cliques", 0)
        res.n_orphans = stats.get("n_orphans", 0)
        res.n_reeliminated = stats.get("n_reeliminated", 0)
        res.wildfire_rounds = stats.get("wildfire_rounds", 0)
        res.bad_pivots = stats.get("bad_pivots", 0)
        res.n_cliques = sum(1 for c in eng.cliques if c is not None)
        if self.params.evaluate_error:
            res.error_after = self.error(self.calculate_estimate())
        return res

    def calculate_estimate(self) -> Values:
        """theta ⊞ delta (ISAM2.cpp:786-818)."""
        return self.theta.retract(self.delta())

    def calculate_estimate_key(self, key: int):
        """Single-variable estimate: theta[key] ⊞ delta[key] — O(1) device
        work (ISAM2::calculateEstimate(Key), avoids the full retract)."""
        key = int(key)
        t = self.theta.type_of(key)
        gid = self._key_gid[key]
        dv = self._engine.delta_rows(np.asarray([gid]), manifold.get(t).dim)[0]
        return manifold.get(t).retract(self.theta.at(key), dv)

    def delta(self) -> Dict[str, jnp.ndarray]:
        eng = self._engine
        out = {}
        for t in self.theta.types():
            dim = manifold.get(t).dim
            gids = np.asarray(
                [self._key_gid[int(k)] for k in self.theta.type_keys(t)],
                dtype=np.int64,
            )
            out[t] = eng.delta_rows(gids, dim)
        return out

    def error(self, values: Optional[Values] = None) -> float:
        """Total nonlinear error over all (non-marginalized) factors."""
        values = values if values is not None else self.calculate_estimate()
        g = self._as_graph()
        return float(g.error(values))

    def marginalize_leaves(self, keys: Sequence[int]) -> None:
        """ISAM2::marginalizeLeaves (ISAM2.cpp:487-724): eliminate the given
        variables out of the tree forever, replacing their factors with
        cached Gaussian marginals on the live separator variables."""
        gids = [self._key_gid[int(k)] for k in keys if int(k) in self._key_gid]
        self._engine.marginalize_leaves(gids)
        self._marginalized.update(int(k) for k in keys)

    # -- internals --------------------------------------------------------------

    def _ensure_engine(self, new_theta: Optional[Values]) -> IncrementalEngine:
        if self._engine is not None:
            return self._engine
        types = new_theta.types() if new_theta is not None else []
        if not types:
            raise ValueError("first ISAM2.update must introduce variables")
        d = self.params.block_dim or max(manifold.get(t).dim for t in types)
        leaf = jax.tree_util.tree_leaves(new_theta.params(types[0]))[0]
        self._engine = IncrementalEngine(d, dtype=leaf.dtype)
        return self._engine

    def _group_for(self, b: FactorBatch) -> int:
        eng = self._engine
        dims = tuple(manifold.get(t).dim for t in b.ftype.var_types)
        if max(dims) > eng.d:
            raise ValueError(
                f"factor dims {dims} exceed engine block dim {eng.d}; "
                "set ISAM2Params.block_dim"
            )
        key = (b.ftype.name, repr(b.robust), float(b.sign))
        g = eng.group_for(key, len(dims), dims, b.sign)
        while len(self._groups) <= g:
            self._groups.append(None)
        if self._groups[g] is None:
            self._groups[g] = _Group(b.ftype, b.robust, float(b.sign))
        return g

    def _linearize_rows(self, g: int, rows: List[int]):
        """Re-linearize a subset of one group's factors at current theta.

        Returns (A tuple per slot [N, d, dim_k] — engine-padded to d rows —
        and b [N, d]); N = len(rows) (unpadded; engine scatter pads)."""
        grp = self._groups[g]
        ftype = grp.ftype
        N = len(rows)
        Np = _pad(N)
        idx = rows + [rows[-1]] * (Np - N)
        params = jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0),
            *[grp.params[r] for r in idx],
        )
        sqrt_info = np.stack([grp.sqrt_info[r] for r in idx], axis=0)
        xs = tuple(
            jax.tree_util.tree_map(
                lambda a: a[
                    self.theta.rows([grp.keys[r][k] for r in idx], t)
                ],
                self.theta.params(t),
            )
            for k, t in enumerate(ftype.var_types)
        )
        dtype_str = str(self._engine.dtype)
        Js, bb = _lin_rows_jit(ftype, grp.robust, Np, dtype_str)(
            xs, params, sqrt_info
        )
        # pad residual dim to engine d rows
        d = self._engine.d
        rd = ftype.resid_dim
        if rd < d:
            Js = tuple(
                jnp.pad(Jk, ((0, 0), (0, d - rd), (0, 0))) for Jk in Js
            )
            bb = jnp.pad(bb, ((0, 0), (0, d - rd)))
        return tuple(Jk[:N] for Jk in Js), bb[:N]

    def _retract_masked(self, relin_gids: Set[int]):
        """Values::retractMasked (Values.h:229): move the linearization point
        of ONLY the marked variables by their current delta."""
        eng = self._engine
        masked = {}
        for t in self.theta.types():
            dim = manifold.get(t).dim
            keys_t = self.theta.type_keys(t)
            gids = np.asarray(
                [self._key_gid[int(k)] for k in keys_t], dtype=np.int64
            )
            mask = np.asarray([g in relin_gids for g in gids])
            if not mask.any():
                continue
            dv = eng.delta_rows(gids, dim)
            masked[t] = jnp.where(jnp.asarray(mask)[:, None], dv, 0.0)
        if masked:
            self.theta = self.theta.retract(masked)

    def _as_graph(self) -> NonlinearFactorGraph:
        g = NonlinearFactorGraph()
        for grp in self._groups:
            if grp is None or not grp.keys:
                continue
            params = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0),
                *grp.params,
            )
            g.add_batch(
                grp.ftype,
                np.asarray(grp.keys, dtype=np.uint64),
                params,
                np.stack(grp.sqrt_info, axis=0),
                grp.robust,
                grp.sign,
            )
        return g

    # exposed for tests / drivers
    @property
    def engine(self) -> IncrementalEngine:
        return self._engine
