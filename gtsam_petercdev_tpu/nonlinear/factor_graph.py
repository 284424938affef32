"""NonlinearFactorGraph as typed struct-of-arrays factor batches.

The reference dispatches NoiseModelFactor::linearize virtually per factor and
parallelizes with TBB (gtsam/nonlinear/NonlinearFactorGraph.cpp:239-280).
Here factors are grouped by FactorType into batches {params: [N,...],
keys: [N,K]}; residuals AND manifold Jacobians come from one
vmap(jacfwd(residual ∘ retract)) per type — JAX autodiff subsumes both the
reference's hand-derived Jacobians and its Expressions reverse-AD engine
(nonlinear/Expression.h:49, internal/ExecutionTrace.h:101).

Linearization output is a `LinearizedGraph`: per batch, whitened Jacobian
blocks A_k [N, d, dim_k] per key slot plus rhs b = -whitened_error [N, d] —
the SoA analog of a JacobianFactor set (gtsam/linear/JacobianFactor.h:91).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear.noise import RobustLoss
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass(frozen=True)
class FactorType:
    """Descriptor of one factor family.

    residual(xs, params) -> [resid_dim]: unbatched; xs is a tuple of single
    variable params (one per key slot, manifold types per var_types).
    """

    name: str
    var_types: Tuple[str, ...]
    resid_dim: int
    residual: Callable[[Tuple[Any, ...], Any], jnp.ndarray]
    # Optional linearization residual (xs_retracted, xs_lin_point, params) ->
    # [resid_dim]. When set, Jacobians come from THIS function (evaluated with
    # xs_lin_point held constant) while `residual` still defines the cost.
    # Used to mirror the reference's chart conventions exactly — e.g.
    # BetweenFactor's default Jacobian omits the Local chain term
    # (gtsam/slam/BetweenFactor.h:111-124, GTSAM_SLOW_BUT_CORRECT_BETWEENFACTOR
    # OFF) and PriorFactor uses an identity Jacobian (PriorFactor.h:98-102).
    linearize_residual: Optional[Callable[[Tuple, Tuple, Any], jnp.ndarray]] = None
    # Optional closed-form linearization (xs, params) -> (r0 [d], Js tuple of
    # [d, dim_k]) — the hand-derived Jacobians the reference ships for its hot
    # factors. When set (and consistent with linearize_residual's chart) it
    # replaces the jacfwd evaluation: jacfwd seeds the residual once per
    # tangent dim (12 passes for a Pose3 Between), which dominated linearize
    # time on TPU; the closed form is a handful of 3x3 products.
    analytic: Optional[Callable[[Tuple, Any], Tuple]] = None

    def retract_fn(self, slot: int):
        return manifold.get(self.var_types[slot]).retract


@dataclass
class FactorBatch:
    ftype: FactorType
    keys: np.ndarray  # [N, K] host-side actual Keys (uint64)
    params: Any  # pytree, leaves [N, ...]
    sqrt_info: jnp.ndarray  # [N, d, d]
    robust: Optional[RobustLoss] = None
    # +1.0 normal factor; -1.0 subtracts information (slam/AntiFactor.h)
    sign: float = 1.0
    # [N, d] bool: rows that are EXACT equality constraints (sigma == 0,
    # NoiseModel.h Constrained). Such rows carry weight 1 in sqrt_info and
    # are handled by the exact constrained-QR solve path (linear/qr.py),
    # not the mu-penalty approximation.
    constrained_mask: Optional[np.ndarray] = None

    @property
    def size(self) -> int:
        return self.keys.shape[0]


@dataclass
class LinearBatch:
    """Whitened linear factor batch: sum_k A_k delta_k ≈ b."""

    var_types: Tuple[str, ...]
    rows: Tuple[np.ndarray, ...]  # per slot, [N] int32 rows into type batch
    A: Tuple[jnp.ndarray, ...]  # per slot, [N, d, dim_k]
    b: jnp.ndarray  # [N, d]
    sign: float = 1.0  # -1.0: information is SUBTRACTED (AntiFactor)
    constrained_mask: Optional[np.ndarray] = None  # [N, d] bool host-side


@dataclass
class LinearizedGraph:
    batches: List[LinearBatch]
    type_counts: Dict[str, int]  # variables per type (delta shapes)

    def flatten_arrays(self):
        return [(lb.A, lb.b) for lb in self.batches]


def residual_and_jac(ftype: FactorType, robust, xs, params, sqrt_info):
    """Whitened residual + manifold Jacobians at delta=0, vmapped over the
    leading axis. All numeric inputs are traced arguments, so callers may
    jit this per (ftype, robust, shape) and feed different factor subsets
    without retracing (the iSAM2 row-granular relinearization path).
    """
    dims = [manifold.get(t).dim for t in ftype.var_types]
    splits = np.cumsum(dims)[:-1].tolist()
    retracts = [ftype.retract_fn(k) for k in range(len(dims))]

    if ftype.analytic is not None:

        def one_analytic(xs_single, p, R):
            r0, Js0 = ftype.analytic(xs_single, p)
            r_w0 = R @ r0
            Jw = tuple(R @ Jk for Jk in Js0)
            return r_w0, Jw

        r_w, Js_t = jax.vmap(one_analytic)(xs, params, sqrt_info)
        Js = list(Js_t)
        if robust is not None:
            e = jnp.linalg.norm(r_w, axis=-1)
            sw = jnp.sqrt(robust.weight(e))[:, None]
            r_w = r_w * sw
            Js = [Jk * sw[..., None] for Jk in Js]
        return r_w, tuple(Js)

    def single(delta_flat, xs_single, p, R):
        deltas = jnp.split(delta_flat, splits)
        xs_r = tuple(
            retracts[k](x, dl) for k, (x, dl) in enumerate(zip(xs_single, deltas))
        )
        if ftype.linearize_residual is not None:
            xs0 = jax.tree_util.tree_map(jax.lax.stop_gradient, xs_single)
            r = ftype.linearize_residual(xs_r, xs0, p)
        else:
            r = ftype.residual(xs_r, p)
        return R @ r

    total = int(sum(dims))

    def one_factor(xs_single, p, R):
        z = jnp.zeros((total,), dtype=R.dtype)
        r_w = single(z, xs_single, p, R)
        J = jax.jacfwd(single)(z, xs_single, p, R)  # [d, total]
        return r_w, J

    r_w, J = jax.vmap(one_factor)(xs, params, sqrt_info)
    Js = []
    start = 0
    for dk in dims:
        Js.append(J[:, :, start : start + dk])
        start += dk

    if robust is not None:
        e = jnp.linalg.norm(r_w, axis=-1)
        sw = jnp.sqrt(robust.weight(e))[:, None]
        r_w = r_w * sw
        Js = [Jk * sw[..., None] for Jk in Js]
    return r_w, tuple(Js)


class NonlinearFactorGraph:
    """Host-side graph builder; all numerics happen in built closures."""

    def __init__(self):
        self.batches: List[FactorBatch] = []
        # staging: ftype.name -> (ftype, [keys], [params], [sqrt_info], robust)
        self._pending: Dict[str, list] = {}

    # -- construction -----------------------------------------------------

    def add_batch(
        self,
        ftype: FactorType,
        keys,
        params,
        sqrt_info,
        robust: Optional[RobustLoss] = None,
        sign: float = 1.0,
        constrained_mask=None,
    ) -> "NonlinearFactorGraph":
        keys = np.asarray(keys, dtype=np.uint64).reshape(-1, len(ftype.var_types))
        n = keys.shape[0]
        # Factor data is stored HOST-side (numpy): it enters jitted functions
        # as closure constants, and numpy constants embed directly into the
        # lowered module. Device-resident constants would be fetched back
        # from the accelerator at every trace (catastrophically slow over a
        # remote-TPU transport).
        params = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
        sqrt_info = np.asarray(sqrt_info)
        if sqrt_info.ndim == 2:
            sqrt_info = np.broadcast_to(
                sqrt_info, (n, ftype.resid_dim, ftype.resid_dim)
            )
        if constrained_mask is not None:
            constrained_mask = np.broadcast_to(
                np.asarray(constrained_mask, dtype=bool), (n, ftype.resid_dim)
            )
        self.batches.append(
            FactorBatch(
                ftype, keys, params, sqrt_info, robust, sign, constrained_mask
            )
        )
        return self

    def add(
        self,
        ftype,
        keys,
        params,
        sqrt_info,
        robust=None,
        sign: float = 1.0,
        constrained_mask=None,
    ):
        """Add a single factor (staged; batched together per type+robust+sign)."""
        tag = (ftype.name, repr(robust), sign, constrained_mask is not None)
        entry = self._pending.setdefault(
            tag, (ftype, [], [], [], robust, sign, [])
        )
        entry[1].append(np.asarray(keys, dtype=np.uint64))
        entry[2].append(params)
        entry[3].append(np.asarray(sqrt_info))
        if constrained_mask is not None:
            entry[6].append(np.asarray(constrained_mask, dtype=bool))
        return self

    def _materialize(self):
        for (ftype, keys, params, infos, robust, sign, masks) in self._pending.values():
            stacked_params = jax.tree_util.tree_map(
                lambda *xs: np.stack([np.asarray(x) for x in xs], axis=0), *params
            )
            self.add_batch(
                ftype,
                np.stack(keys, axis=0),
                stacked_params,
                np.stack(infos, axis=0),
                robust,
                sign,
                np.stack(masks, axis=0) if masks else None,
            )
        self._pending = {}

    @property
    def num_factors(self) -> int:
        self._materialize()
        return sum(b.size for b in self.batches)

    def all_keys(self):
        self._materialize()
        out = []
        seen = set()
        for b in self.batches:
            for k in b.keys.reshape(-1):
                if k not in seen:
                    seen.add(k)
                    out.append(int(k))
        return out

    # -- numeric closures ---------------------------------------------------

    def _batch_terms(self, batch: FactorBatch, values: Values):
        """rows (host) + gathered variable params for one batch."""
        rows = tuple(
            values.rows(batch.keys[:, k], t) for k, t in enumerate(batch.ftype.var_types)
        )
        return rows

    def _residual_and_jac(self, batch: FactorBatch, xs):
        """vmapped whitened residual + Jacobians at delta=0.

        xs: tuple of gathered variable params, leaves [N, ...].
        Returns (r_w [N,d], Jws tuple of [N,d,dim_k]).
        """
        return residual_and_jac(
            batch.ftype, batch.robust, xs, batch.params, batch.sqrt_info
        )

    def _gather(self, values: Values, batch: FactorBatch, rows):
        return tuple(
            jax.tree_util.tree_map(lambda a: a[rows[k]], values.params(t))
            for k, t in enumerate(batch.ftype.var_types)
        )

    def error(self, values: Values) -> jnp.ndarray:
        """Total graph error = sum 0.5||whitened||^2 (robust: rho(||.||)).

        Matches NonlinearFactorGraph::error / NoiseModelFactor::error.
        """
        self._materialize()
        total = 0.0
        for batch in self.batches:
            rows = self._batch_terms(batch, values)
            xs = self._gather(values, batch, rows)

            def single_err(xs_single, params, R):
                return R @ batch.ftype.residual(xs_single, params)

            r_w = jax.vmap(single_err)(xs, batch.params, batch.sqrt_info)
            if batch.robust is not None:
                e = jnp.linalg.norm(r_w, axis=-1)
                total = total + batch.sign * jnp.sum(batch.robust.loss(e))
            else:
                total = total + batch.sign * 0.5 * jnp.sum(r_w * r_w)
        return total

    def linearize(self, values: Values) -> LinearizedGraph:
        """Linearize at `values` -> whitened LinearizedGraph.

        b = -whitened_error so the linear problem is min ||A delta - b||^2
        (JacobianFactor convention, gtsam/nonlinear/NonlinearFactor.h:256-299).
        """
        self._materialize()
        out = []
        for batch in self.batches:
            rows = self._batch_terms(batch, values)
            xs = self._gather(values, batch, rows)
            r_w, Js = self._residual_and_jac(batch, xs)
            out.append(
                LinearBatch(
                    var_types=batch.ftype.var_types, rows=rows, A=Js, b=-r_w,
                    sign=batch.sign, constrained_mask=batch.constrained_mask,
                )
            )
        counts = {
            t: jax.tree_util.tree_leaves(values.params(t))[0].shape[0]
            for t in values.types()
        }
        return LinearizedGraph(out, counts)
