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
