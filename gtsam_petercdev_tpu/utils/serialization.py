"""Checkpointing: save/load Values, factor graphs, and optimizer state.

Reference: gtsam/base/serialization.h:97-270 (boost::serialization of every
factor/value type to text/XML/binary; SolverComparer.cpp:19-30 round-trips
full solver state between runs).

TPU-native analog (SURVEY §5.4): state is pytrees of arrays + a small host
index. Arrays go to one compressed .npz; the host structure (key maps,
factor-type NAMES, robust-loss specs) goes alongside as pickled metadata.
Factor types are resolved BY NAME through a registry at load time — the
callable residuals themselves are never serialized (the analog of boost's
polymorphic type registration, gtsam_unstable/slam/serialization.cpp).
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear.noise import RobustLoss
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values

# --- factor-type registry ----------------------------------------------------

_TYPE_REGISTRY: Dict[str, Callable[[], FactorType]] = {}


def register_factor_type(name: str, builder: Callable[[], FactorType]) -> None:
    _TYPE_REGISTRY[name] = builder


def resolve_factor_type(name: str) -> FactorType:
    if name in _TYPE_REGISTRY:
        return _TYPE_REGISTRY[name]()
    # built-in Prior*/Between* families resolve structurally
    from gtsam_petercdev_tpu.slam import factors as slam_factors

    if name.startswith("Prior"):
        return slam_factors.prior_factor(name[len("Prior"):])
    if name.startswith("Between"):
        return slam_factors.between_factor(name[len("Between"):])
    if name.startswith("LinearContainer["):
        # "LinearContainer[T1,T2]<dim>" (fixed-lag marginal factors)
        from gtsam_petercdev_tpu.nonlinear.fixed_lag import linear_container_factor

        inner, dim = name[len("LinearContainer["):].rsplit("]", 1)
        return linear_container_factor(tuple(inner.split(",")), int(dim))
    raise KeyError(
        f"unknown factor type {name!r}; register it with "
        "serialization.register_factor_type"
    )


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a), tree)


# --- Values ------------------------------------------------------------------


def values_to_bytes(values: Values) -> bytes:
    values._materialize()
    state = {
        "params": {t: _to_host(values.params(t)) for t in values.types()},
        "index": dict(values._index),
        "type_keys": {t: list(ks) for t, ks in values._type_keys.items()},
    }
    return pickle.dumps(state, protocol=4)


def values_from_bytes(data: bytes) -> Values:
    state = pickle.loads(data)
    return Values(
        {t: _to_device(p) for t, p in state["params"].items()},
        state["index"],
        state["type_keys"],
    )


def save_values(path: str, values: Values) -> None:
    with open(path, "wb") as f:
        f.write(values_to_bytes(values))


def load_values(path: str) -> Values:
    with open(path, "rb") as f:
        return values_from_bytes(f.read())


# --- NonlinearFactorGraph ----------------------------------------------------


def graph_to_bytes(graph: NonlinearFactorGraph) -> bytes:
    graph._materialize()
    batches = []
    for b in graph.batches:
        batches.append(
            {
                "ftype": b.ftype.name,
                "keys": np.asarray(b.keys),
                "params": _to_host(b.params),
                "sqrt_info": np.asarray(b.sqrt_info),
                "robust": (b.robust.name, b.robust.k) if b.robust else None,
            }
        )
    return pickle.dumps({"batches": batches}, protocol=4)


def graph_from_bytes(data: bytes) -> NonlinearFactorGraph:
    state = pickle.loads(data)
    graph = NonlinearFactorGraph()
    for bs in state["batches"]:
        robust = RobustLoss(*bs["robust"]) if bs["robust"] else None
        graph.add_batch(
            resolve_factor_type(bs["ftype"]),
            bs["keys"],
            _to_device(bs["params"]),
            jnp.asarray(bs["sqrt_info"]),
            robust,
        )
    return graph


def save_graph(path: str, graph: NonlinearFactorGraph) -> None:
    with open(path, "wb") as f:
        f.write(graph_to_bytes(graph))


def load_graph(path: str) -> NonlinearFactorGraph:
    with open(path, "rb") as f:
        return graph_from_bytes(f.read())


# --- combined solver checkpoint ----------------------------------------------


def save_checkpoint(
    path: str,
    graph: Optional[NonlinearFactorGraph] = None,
    values: Optional[Values] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    """One-file checkpoint of (graph, values, extra arrays) — the analog of
    SolverComparer's binary solver-state archives."""
    state = {
        "graph": graph_to_bytes(graph) if graph is not None else None,
        "values": values_to_bytes(values) if values is not None else None,
        "extra": _to_host(extra) if extra is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=4)


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        state = pickle.load(f)
    graph = graph_from_bytes(state["graph"]) if state["graph"] else None
    values = values_from_bytes(state["values"]) if state["values"] else None
    extra = _to_device(state["extra"]) if state["extra"] is not None else None
    return graph, values, extra


# --- full ISAM2 engine checkpoint --------------------------------------------
#
# The reference serializes whole ISAM2 instances
# (examples/SolverComparer.cpp:19-30, base/serialization.h:97-270) so
# multi-hour incremental runs survive restarts. The numpy-backend engine is
# pure host state (per-clique payload arrays + python records), so a
# structured pickle round-trips it exactly; factor types are stored BY NAME
# and resolved through the registry, mirroring graph_to_bytes.


def isam2_to_bytes(isam) -> bytes:
    eng = isam._engine
    if eng is None:
        raise ValueError("empty ISAM2 (no update yet)")
    if not eng._np:
        raise NotImplementedError(
            "engine checkpoint is supported for the numpy backend (the "
            "incremental production path); jax-backend state is device-side"
        )

    def rec_state(c):
        if c is None:
            return None
        return (c.cid, c.cls, c.frontal, c.separator, c.parent,
                sorted(c.children), c.owned_fac, c.owned_msg, c.alive)

    eng_state = {
        "d": eng.d,
        "dtype": str(jnp.dtype(eng.dtype)),
        "n": eng.n,
        "var_dims": eng.var_dims,
        "xcap": eng.xcap,
        "x": eng.x,
        "cliques": [rec_state(c) for c in eng.cliques],
        "var_clique": dict(eng.var_clique),
        "groups": [
            (fg.gid, fg.K, fg.dims, fg.sign, fg.cap,
             tuple(np.asarray(a) for a in fg.A), np.asarray(fg.b),
             fg.keys, fg.n)
            for fg in eng.groups
        ],
        "var_factors": {k: list(v) for k, v in eng.var_factors.items()},
        "msgs": [
            None if m is None else (m.mid, m.ns, m.row, m.scope, m.alive)
            for m in eng.msgs
        ],
        "msg_payloads": dict(eng.msg_payloads),
        "payloads": {cid: tuple(p) for cid, p in eng.payloads.items()},
        "removed_units": sorted(eng.removed_units),
        "n_live": eng.n_live,
    }
    wrap_state = {
        "params": isam.params.__dict__,
        "key_gid": dict(isam._key_gid),
        "gid_key": list(isam._gid_key),
        "gid_type": list(isam._gid_type),
        "gid_row": list(isam._gid_row),
        "stores": {
            t: {
                "n": st.n, "cap": st.cap, "gids": st.gids,
                "params": _to_host(st.params),
            }
            for t, st in isam._stores.items()
        },
        "groups": [
            None if g is None else {
                "ftype": g.ftype.name,
                "robust": (g.robust.name, g.robust.k) if g.robust else None,
                "sign": g.sign, "n": g.n, "cap": g.cap,
                "params": _to_host(g.params), "sqrt_info": g.sqrt_info,
                "keys": g.keys, "retired": g.retired,
            }
            for g in isam._groups
        ],
        "marginalized": sorted(isam._marginalized),
        "fixed_gids": sorted(isam._fixed_gids),
        "update_count": isam._update_count,
    }
    return pickle.dumps({"engine": eng_state, "wrapper": wrap_state},
                        protocol=4)


def isam2_from_bytes(data: bytes):
    from gtsam_petercdev_tpu.inference.incremental import (
        CliqueRec,
        FactorGroup,
        IncrementalEngine,
        MsgRec,
        PoolArrays,
    )
    from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params, _Group
    from gtsam_petercdev_tpu.nonlinear.isam2 import _TypeStore

    state = pickle.loads(data)
    es, ws = state["engine"], state["wrapper"]

    isam = ISAM2(ISAM2Params(**ws["params"]))
    eng = IncrementalEngine(
        es["d"], dtype=jnp.dtype(es["dtype"]), backend="numpy"
    )
    eng.n = es["n"]
    eng.var_dims = es["var_dims"]
    eng.xcap = es["xcap"]
    eng.x = np.ascontiguousarray(es["x"])
    eng.var_clique = dict(es["var_clique"])
    eng.var_factors = {k: list(v) for k, v in es["var_factors"].items()}
    eng.removed_units = set(map(tuple, es["removed_units"]))
    eng.n_live = es["n_live"]
    eng.msg_payloads = dict(es["msg_payloads"])
    eng.payloads = {
        cid: PoolArrays(*(np.ascontiguousarray(a) for a in p))
        for cid, p in es["payloads"].items()
    }
    for (gid, K, dims, sign, cap, A, b, keys, n_) in es["groups"]:
        eng.groups.append(
            FactorGroup(gid=gid, K=K, dims=tuple(dims), sign=sign, cap=cap,
                        A=tuple(A), b=b, keys=keys, n=n_)
        )
    for ms in es["msgs"]:
        eng.msgs.append(
            None if ms is None
            else MsgRec(mid=ms[0], ns=ms[1], row=ms[2], scope=list(ms[3]),
                        alive=ms[4])
        )
    for cs in es["cliques"]:
        if cs is None:
            eng.cliques.append(None)
            continue
        rec = CliqueRec(
            cid=cs[0], cls=tuple(cs[1]), row=-1, frontal=list(cs[2]),
            separator=list(cs[3]), parent=cs[4], children=set(cs[5]),
            owned_fac=[tuple(u) for u in cs[6]], owned_msg=list(cs[7]),
            alive=cs[8],
        )
        eng.cliques.append(rec)
        if rec.alive and eng._nat is not None and rec.cid in eng.payloads:
            eng._nat.alloc(rec, eng.payloads[rec.cid])
    if eng._nat is not None:
        for rec in eng.cliques:
            if rec is not None and rec.alive and rec.parent >= 0:
                eng._nat.set_parent(rec, eng.cliques[rec.parent])

    isam._engine = eng
    isam._key_gid = {int(k): v for k, v in ws["key_gid"].items()}
    isam._gid_key = list(ws["gid_key"])
    isam._gid_type = list(ws["gid_type"])
    isam._gid_row = list(ws["gid_row"])
    isam._marginalized = set(ws["marginalized"])
    isam._fixed_gids = set(ws["fixed_gids"])
    isam._update_count = ws["update_count"]
    for t, ss in ws["stores"].items():
        st = _TypeStore(t, eng.dtype)
        st.n, st.cap = ss["n"], ss["cap"]
        st.gids = ss["gids"]
        st.params = _to_device(ss["params"])
        isam._stores[t] = st
    for g, gs in enumerate(ws["groups"]):
        if gs is None:
            isam._groups.append(None)
            continue
        ftype = resolve_factor_type(gs["ftype"])
        robust = RobustLoss(*gs["robust"]) if gs["robust"] else None
        grp = _Group(ftype, robust, gs["sign"])
        grp.n, grp.cap = gs["n"], gs["cap"]
        grp.params = gs["params"]
        grp.sqrt_info = gs["sqrt_info"]
        grp.keys = gs["keys"]
        grp.retired = gs["retired"]
        isam._groups.append(grp)
        # engine group_for key must match future add() lookups
        eng._group_key[(ftype, robust, float(gs["sign"]))] = g
    return isam


def save_isam2(path: str, isam) -> None:
    """Checkpoint a full ISAM2 solver (Bayes tree + cached factors + delta +
    linearization points) so an incremental run can resume mid-stream."""
    with open(path, "wb") as f:
        f.write(isam2_to_bytes(isam))


def load_isam2(path: str):
    with open(path, "rb") as f:
        return isam2_from_bytes(f.read())
