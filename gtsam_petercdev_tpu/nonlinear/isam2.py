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
     |delta| > relinearize_threshold are marked — excluding variables in the
     scope of persistent marginal factors (the reference's fixedVariables_,
     ISAM2.cpp:693 + gatherRelinearizeKeys:457: moving them would silently
     bias the frozen marginal message).
  4. retractMasked (Values.h:229): ONLY marked vars move their linearization
     point; their delta zeroes; every cached factor row touching them is
     re-linearized in place (row-granular, padded-jit — no full re-linearize).
  5. engine.update re-eliminates the affected top and wildfire-solves delta.

Performance contract (examples/ISAM2_City10000.cpp is the target workload):
the linearization point lives in CAPACITY-padded per-type device stores, so
every per-step device call has a shape signature that changes only on
power-of-two capacity growth — steady-state updates hit warm jit caches and
trigger zero XLA compiles.

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
    # "auto": eager numpy engine on CPU hosts (zero compile churn for the
    # latency-bound incremental loop), jitted engine on accelerators
    engine_backend: str = "auto"


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
    # engine units of the factors added THIS update (pass to remove_factors)
    new_factor_units: List[Tuple[int, int]] = field(default_factory=list)


# ---------------------------------------------------------------------------
# jitted helpers (all signatures keyed on capacity classes, never exact n)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _lin_rows_jit(ftype, robust, Np, caps, d, dtype_str):
    """Linearize Np factor rows of one group: gather variable params from the
    padded type stores, evaluate whitened residual+Jacobians, pad residual
    rows to the engine block dim d."""

    rd = ftype.resid_dim

    def f(stores, row_idx, params, sqrt_info):
        xs = tuple(
            jax.tree_util.tree_map(lambda a, i=idx: a[i], store)
            for store, idx in zip(stores, row_idx)
        )
        r_w, Js = residual_and_jac(ftype, robust, xs, params, sqrt_info)
        b = -r_w
        if rd < d:
            Js = tuple(jnp.pad(Jk, ((0, 0), (0, d - rd), (0, 0))) for Jk in Js)
            b = jnp.pad(b, ((0, 0), (0, d - rd)))
        return Js, b

    return jax.jit(f)


@lru_cache(maxsize=None)
def _insert_rows_jit(t, cap, Np):
    def f(params, idx, vals):
        return jax.tree_util.tree_map(
            lambda a, v: a.at[idx].set(v), params, vals
        )

    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _retract_masked_jit(t, cap, xcap, dtype_str):
    """store' = where(mask, retract(store, x[gid,:dim]), store)."""
    mt = manifold.get(t)

    def f(params, x, gid_idx, mask):
        dv = x[gid_idx, : mt.dim]
        newp = mt.retract(params, dv)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                mask.reshape(mask.shape + (1,) * (a.ndim - 1)), b, a
            ),
            params,
            newp,
        )

    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _estimate_jit(t, cap, xcap):
    """Full-store retract: theta ⊞ delta for every valid row."""
    mt = manifold.get(t)

    def f(params, x, gid_idx, mask):
        dv = x[gid_idx, : mt.dim]
        newp = mt.retract(params, dv)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                mask.reshape(mask.shape + (1,) * (a.ndim - 1)), b, a
            ),
            params,
            newp,
        )

    return jax.jit(f)


@lru_cache(maxsize=None)
def _estimate_key_jit(t, cap, xcap):
    """Single-variable estimate: gather row + retract by its delta (one
    fused device call; ISAM2::calculateEstimate(Key))."""
    mt = manifold.get(t)

    def f(params, x, row, gid):
        p = jax.tree_util.tree_map(lambda a: a[row], params)
        return mt.retract(p, x[gid, : mt.dim])

    return jax.jit(f)


class _TypeStore:
    """Capacity-padded device store of one manifold type's linearization
    points (row `cap` is a trash row, mirroring the engine pools)."""

    __slots__ = ("t", "mt", "n", "cap", "params", "gids")

    def __init__(self, t: str, dtype):
        self.t = t
        self.mt = manifold.get(t)
        self.n = 0
        self.cap = 0
        self.params = None  # pytree, leaves [cap+1, ...]
        self.gids = np.zeros(0, dtype=np.int32)  # [cap] gid per row

    def ensure(self, need: int, proto, dtype):
        if need <= self.cap:
            return
        # generous floor: cap feeds EVERY wrapper-jit signature (linearize /
        # retract / estimate), so each growth event recompiles that family;
        # 4096 rows of a small-manifold store is ~100 KB
        new_cap = max(4096, self.cap)
        while new_cap < need:
            new_cap *= 2
        proto_leaves = jax.tree_util.tree_map(
            lambda a: jnp.zeros((new_cap + 1,) + np.shape(a)[1:], dtype=dtype),
            proto,
        )
        if self.params is not None:
            old = self.params
            n = self.n
            self.params = jax.tree_util.tree_map(
                lambda z, o: z.at[:n].set(o[:n]), proto_leaves, old
            )
        else:
            self.params = proto_leaves
        g = np.zeros(new_cap, dtype=np.int32)
        g[: self.cap] = self.gids[: self.cap] if self.cap else []
        self.gids = g
        self.cap = new_cap


class _Group:
    """Host mirror of one engine factor group (numpy storage — relinearize
    and error() slice it without touching the device)."""

    __slots__ = (
        "ftype", "robust", "sign", "n", "cap",
        "params", "sqrt_info", "keys", "retired",
    )

    def __init__(self, ftype, robust, sign):
        self.ftype = ftype
        self.robust = robust
        self.sign = sign
        self.n = 0
        self.cap = 0
        self.params = None  # pytree of numpy [cap, ...]
        self.sqrt_info = None  # numpy [cap, rd, rd]
        self.keys = None  # numpy [cap, K]
        self.retired = None  # numpy bool [cap]

    def append(self, params_np, sqrt_info_np, keys_np):
        k = keys_np.shape[0]
        if self.n + k > self.cap:
            new_cap = max(16, self.cap)
            while new_cap < self.n + k:
                new_cap *= 2

            def grow(old, proto):
                out = np.zeros((new_cap,) + proto.shape[1:], dtype=proto.dtype)
                if old is not None:
                    out[: self.n] = old[: self.n]
                return out

            if self.params is not None:
                self.params = jax.tree_util.tree_map(
                    lambda pn, po: grow(po, pn), params_np, self.params
                )
            else:
                self.params = jax.tree_util.tree_map(
                    lambda pn: grow(None, pn), params_np
                )
            self.sqrt_info = grow(self.sqrt_info, sqrt_info_np)
            self.keys = grow(self.keys, keys_np)
            r = np.zeros(new_cap, dtype=bool)
            if self.retired is not None:
                r[: self.n] = self.retired[: self.n]
            self.retired = r
            self.cap = new_cap
        sl = slice(self.n, self.n + k)
        jax.tree_util.tree_map(
            lambda dst, src: dst.__setitem__(sl, src), self.params, params_np
        )
        self.sqrt_info[sl] = sqrt_info_np
        self.keys[sl] = keys_np
        rows = list(range(self.n, self.n + k))
        self.n += k
        return rows


class ISAM2:
    def __init__(self, params: Optional[ISAM2Params] = None):
        self.params = params or ISAM2Params()
        self._engine: Optional[IncrementalEngine] = None
        self._key_gid: Dict[int, int] = {}
        self._gid_key: List[int] = []
        self._gid_type: List[str] = []
        self._gid_row: List[int] = []  # row in the type store
        self._stores: Dict[str, _TypeStore] = {}
        self._groups: List[Optional[_Group]] = []
        self._marginalized: Set[int] = set()  # keys removed from the tree
        # gids in the scope of persistent marginal factors: never relinearized
        # (reference fixedVariables_, ISAM2.cpp:693)
        self._fixed_gids: Set[int] = set()
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

        if self.params.evaluate_error and self._gid_key:
            # errorBefore at the pre-update estimate (theta ⊞ delta), matching
            # ISAM2::update's evaluateNonlinearError before state mutates.
            res.error_before = self.error(self.calculate_estimate())

        # 1. add variables
        new_gids = self._add_variables(new_theta)

        # 2. add factors (linearize once, cache in the engine)
        marked: Set[int] = set()
        new_units: List[Tuple[int, int]] = []
        if new_factors is not None:
            new_factors._materialize()
            for b in new_factors.batches:
                bad = [
                    int(k)
                    for k in b.keys.reshape(-1)
                    if int(k) in self._marginalized
                ]
                if bad:
                    raise ValueError(
                        f"factor references marginalized key(s) {bad[:4]}"
                    )
                g = self._group_for(b)
                grp = self._groups[g]
                params_np = jax.tree_util.tree_map(np.asarray, b.params)
                rows = grp.append(
                    params_np,
                    np.asarray(b.sqrt_info),
                    np.asarray(b.keys, dtype=np.int64),
                )
                gids = np.asarray(
                    [[self._key_gid[int(k)] for k in row] for row in b.keys],
                    dtype=np.int64,
                )
                A, bb = self._linearize_rows(g, rows)
                erows = eng.add_factors(g, gids, A, bb)
                new_units.extend((g, r) for r in erows)
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
                if gid in eng.var_clique and gid not in self._fixed_gids:
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
        res.n_cliques = eng.n_live
        res.new_factor_units = list(new_units)
        if self.params.evaluate_error:
            res.error_after = self.error(self.calculate_estimate())
        return res

    def remove_factors(self, units: Sequence[Tuple[int, int]]) -> None:
        """Remove previously added factors by their engine units (returned
        in ISAM2Result.new_factor_units) — the ISAM2UpdateParams
        removeFactorIndices analog. The affected part of the tree is
        re-eliminated without the removed information."""
        if not units:
            return
        eng = self._engine
        for (g, r) in units:
            grp = self._groups[g]
            if grp is not None and grp.retired is not None and r < grp.n:
                grp.retired[r] = True
        marked = eng.remove_factor_units(units)
        marked = {g for g in marked if g in eng.var_clique}
        if marked:
            eng.update(
                marked=marked,
                wildfire_threshold=self.params.wildfire_threshold,
            )
        self._update_count += 1
        self._tm_cache = None

    @property
    def theta(self) -> Values:
        """The linearization point as a Values (materialized on demand)."""
        return self._theta_values()

    def calculate_estimate(self) -> Values:
        """theta ⊞ delta (ISAM2.cpp:786-818)."""
        eng = self._engine
        v = Values()
        for t, st in self._stores.items():
            if st.n == 0:
                continue
            fn = _estimate_jit(t, st.cap, eng.xcap)
            mask = np.zeros(st.cap + 1, dtype=bool)
            mask[: st.n] = True
            gidx = np.full(st.cap + 1, eng.xcap, dtype=np.int32)
            gidx[: st.n] = st.gids[: st.n]
            newp = fn(st.params, eng.x_snapshot(), jnp.asarray(gidx), jnp.asarray(mask))
            keys_t = [self._gid_key[g] for g in st.gids[: st.n]]
            # marginalized variables are gone from theta (ISAM2.cpp:717)
            live = np.asarray(
                [k not in self._marginalized for k in keys_t], dtype=bool
            )
            if live.all():
                v.insert_batch(
                    keys_t, t,
                    jax.tree_util.tree_map(lambda a: a[: st.n], newp),
                )
            elif live.any():
                (idx,) = np.nonzero(live)
                v.insert_batch(
                    [keys_t[i] for i in idx], t,
                    jax.tree_util.tree_map(lambda a: a[jnp.asarray(idx)], newp),
                )
        return v

    def calculate_estimate_key(self, key: int):
        """Single-variable estimate: theta[key] ⊞ delta[key] — one fused O(1)
        device call (ISAM2::calculateEstimate(Key), avoids the full retract)."""
        key = int(key)
        gid = self._key_gid[key]
        t = self._gid_type[gid]
        st = self._stores[t]
        fn = _estimate_key_jit(t, st.cap, self._engine.xcap)
        return fn(st.params, self._engine.x_snapshot(), self._gid_row[gid], gid)

    def delta(self) -> Dict[str, jnp.ndarray]:
        eng = self._engine
        out = {}
        for t, st in self._stores.items():
            if st.n:
                out[t] = eng.delta_rows(st.gids[: st.n], st.mt.dim)
        return out

    def error(self, values: Optional[Values] = None) -> float:
        """Total nonlinear error over all live (non-retired) factors.

        Factors absorbed into marginal messages by marginalize_leaves are
        excluded; the frozen marginal messages themselves are not part of the
        nonlinear cost (they are Gaussian priors on the separator)."""
        values = values if values is not None else self.calculate_estimate()
        g = self._as_graph()
        return float(g.error(values))

    def marginal_covariance(self, key: int) -> jnp.ndarray:
        """Tangent-space marginal covariance at the current linearization
        point — ISAM2::marginalCovariance via the Bayes-tree top-down sweep
        (inference/treemarg.py; BayesTreeCliqueBase.h:172-203 semantics)."""
        tm = self._tree_marginals()
        gid = self._key_gid[int(key)]
        d = manifold.get(self._gid_type[gid]).dim
        return tm.covariance_gid(gid)[:d, :d]

    def joint_marginal_covariance(self, keys: Sequence[int]) -> jnp.ndarray:
        """Joint covariance over keys sharing one clique scope (common case:
        adjacent states). Raises if the keys span cliques — use batch
        Marginals for arbitrary joints."""
        tm = self._tree_marginals()
        gids = [self._key_gid[int(k)] for k in keys]
        J = tm.joint_gids(gids)
        if J is None:
            raise ValueError(
                "keys do not share a clique scope; use nonlinear.Marginals"
            )
        d = self._engine.d
        dims = [manifold.get(self._gid_type[g]).dim for g in gids]
        sel = np.concatenate(
            [i * d + np.arange(dd) for i, dd in enumerate(dims)]
        )
        return J[jnp.asarray(sel)[:, None], jnp.asarray(sel)[None, :]]

    def _tree_marginals(self):
        from gtsam_petercdev_tpu.inference.treemarg import TreeMarginals

        if (
            getattr(self, "_tm_cache", None) is None
            or self._tm_cache[0] != self._update_count
        ):
            self._tm_cache = (self._update_count, TreeMarginals(self._engine))
        return self._tm_cache[1]

    def marginalize_leaves(
        self, keys: Sequence[int], keep_messages: bool = True
    ) -> None:
        """ISAM2::marginalizeLeaves (ISAM2.cpp:487-724): eliminate the given
        variables out of the tree forever, replacing their factors with
        cached Gaussian marginals on the live separator variables. Scope
        variables of those marginals become FIXED (never relinearized)."""
        eng = self._engine
        gids = [self._key_gid[int(k)] for k in keys if int(k) in self._key_gid]
        n_msgs_before = len(eng.msgs)
        retired = eng.marginalize_leaves(gids, keep_messages=keep_messages)
        for (g, r) in retired:
            grp = self._groups[g]
            if grp is not None and r < grp.n:
                grp.retired[r] = True
        for mr in eng.msgs[n_msgs_before:]:
            if mr is not None:
                self._fixed_gids.update(int(v) for v in mr.scope)
        self._marginalized.update(int(k) for k in keys)
        # the tree was re-eliminated (retired cliques, new marginal
        # messages): cached TreeMarginals index the OLD clique layout, so
        # drop them (the cache key _update_count does not change here)
        self._tm_cache = None

    # -- internals --------------------------------------------------------------

    def _ensure_engine(self, new_theta: Optional[Values]) -> IncrementalEngine:
        if self._engine is not None:
            return self._engine
        types = new_theta.types() if new_theta is not None else []
        if not types:
            raise ValueError("first ISAM2.update must introduce variables")
        d = self.params.block_dim or max(manifold.get(t).dim for t in types)
        leaf = jax.tree_util.tree_leaves(new_theta.params(types[0]))[0]
        self._engine = IncrementalEngine(
            d, dtype=leaf.dtype, backend=self.params.engine_backend
        )
        return self._engine

    def _add_variables(self, new_theta: Optional[Values]) -> List[int]:
        if new_theta is None:
            return []
        eng = self._engine
        new_gids: List[int] = []
        dims: List[int] = []
        for t in new_theta.types():
            st = self._stores.get(t)
            if st is None:
                st = self._stores[t] = _TypeStore(t, eng.dtype)
            params_np = jax.tree_util.tree_map(
                np.asarray, new_theta.params(t)
            )
            keys_t = new_theta.type_keys(t)
            k = len(keys_t)
            st.ensure(st.n + k, params_np, eng.dtype)
            rows = list(range(st.n, st.n + k))
            for key, row in zip(keys_t, rows):
                key = int(key)
                if key in self._key_gid:
                    raise KeyError(f"key {key} already in ISAM2")
                gid = len(self._gid_key)
                self._key_gid[key] = gid
                self._gid_key.append(key)
                self._gid_type.append(t)
                self._gid_row.append(row)
                st.gids[row] = gid
                dims.append(st.mt.dim)
                new_gids.append(gid)
            # scatter the new rows (shape-padded; stable signatures)
            Np = _pad(k)
            idx = np.full(Np, st.cap, dtype=np.int32)
            idx[:k] = rows
            vals = jax.tree_util.tree_map(
                lambda a: np.concatenate(
                    [a, np.zeros((Np - k,) + a.shape[1:], a.dtype)], axis=0
                )
                if Np > k
                else a,
                params_np,
            )
            st.params = _insert_rows_jit(t, st.cap, Np)(
                st.params, jnp.asarray(idx), vals
            )
            st.n += k
        eng.add_variables(dims)
        return new_gids

    def _group_for(self, b: FactorBatch) -> int:
        eng = self._engine
        dims = tuple(manifold.get(t).dim for t in b.ftype.var_types)
        if max(dims) > eng.d:
            raise ValueError(
                f"factor dims {dims} exceed engine block dim {eng.d}; "
                "set ISAM2Params.block_dim"
            )
        # key on the objects themselves (FactorType/RobustLoss are frozen
        # dataclasses): two distinct factor families never share a group
        key = (b.ftype, b.robust, float(b.sign))
        g = eng.group_for(key, len(dims), dims, b.sign)
        while len(self._groups) <= g:
            self._groups.append(None)
        if self._groups[g] is None:
            self._groups[g] = _Group(b.ftype, b.robust, float(b.sign))
        return g

    def _linearize_rows(self, g: int, rows: List[int]):
        """(Re-)linearize a subset of one group's factors at current theta.

        Returns (A tuple per slot [Np, d, dim_k], b [Np, d]) shape-padded to
        Np = _pad(len(rows)); engine scatter routes pad rows to trash."""
        grp = self._groups[g]
        ftype = grp.ftype
        eng = self._engine
        N = len(rows)
        # coarse shape classes (x8): relinearization touches a different row
        # count every step, and each distinct Np is an XLA compile
        Np = 1
        while Np < N:
            Np *= 8
        idx = np.asarray(rows + [rows[-1]] * (Np - N), dtype=np.int64)
        params = jax.tree_util.tree_map(lambda a: a[idx], grp.params)
        sqrt_info = grp.sqrt_info[idx]
        stores = tuple(
            self._stores[t].params for t in ftype.var_types
        )
        caps = tuple(self._stores[t].cap for t in ftype.var_types)
        keys_sel = grp.keys[idx]  # [Np, K]
        row_idx = tuple(
            np.asarray(
                [self._gid_row[self._key_gid[int(k)]] for k in keys_sel[:, kk]],
                dtype=np.int32,
            )
            for kk in range(keys_sel.shape[1])
        )
        fn = _lin_rows_jit(
            ftype, grp.robust, Np, caps, eng.d, str(eng.dtype)
        )
        return fn(stores, row_idx, params, sqrt_info)

    def _retract_masked(self, relin_gids: Set[int]):
        """Values::retractMasked (Values.h:229): move the linearization point
        of ONLY the marked variables by their current delta (one fused
        device call per type, capacity-stable shapes)."""
        eng = self._engine
        by_type: Dict[str, List[int]] = {}
        for gid in relin_gids:
            by_type.setdefault(self._gid_type[gid], []).append(gid)
        for t, gids in by_type.items():
            st = self._stores[t]
            mask = np.zeros(st.cap + 1, dtype=bool)
            gidx = np.full(st.cap + 1, eng.xcap, dtype=np.int32)
            gidx[: st.n] = st.gids[: st.n]
            for gid in gids:
                mask[self._gid_row[gid]] = True
            fn = _retract_masked_jit(t, st.cap, eng.xcap, str(eng.dtype))
            st.params = fn(
                st.params, eng.x_snapshot(), jnp.asarray(gidx),
                jnp.asarray(mask)
            )

    def _theta_values(self) -> Values:
        v = Values()
        for t, st in self._stores.items():
            if st.n == 0:
                continue
            keys_t = [self._gid_key[g] for g in st.gids[: st.n]]
            live = np.asarray(
                [k not in self._marginalized for k in keys_t], dtype=bool
            )
            if not live.any():
                continue
            (idx,) = np.nonzero(live)
            if live.all():
                v.insert_batch(
                    keys_t, t,
                    jax.tree_util.tree_map(lambda a: a[: st.n], st.params),
                )
            else:
                v.insert_batch(
                    [keys_t[i] for i in idx], t,
                    jax.tree_util.tree_map(
                        lambda a: a[jnp.asarray(idx)], st.params
                    ),
                )
        return v

    def _as_graph(self) -> NonlinearFactorGraph:
        g = NonlinearFactorGraph()
        for grp in self._groups:
            if grp is None or grp.n == 0:
                continue
            live = ~grp.retired[: grp.n]
            if not live.any():
                continue
            g.add_batch(
                grp.ftype,
                grp.keys[: grp.n][live].astype(np.uint64),
                jax.tree_util.tree_map(lambda a: a[: grp.n][live], grp.params),
                grp.sqrt_info[: grp.n][live],
                grp.robust,
                grp.sign,
            )
        return g

    # exposed for tests / drivers
    @property
    def engine(self) -> IncrementalEngine:
        return self._engine
