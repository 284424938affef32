"""Values — type-erased key->manifold-value container, struct-of-arrays.

The reference Values (gtsam/nonlinear/Values.h:65) maps Key -> polymorphic
Value*. The TPU-native design stores ONE stacked parameter pytree per manifold
type (leading axis = number of variables of that type), plus a host-side
key->(type, row) index. All device work is therefore batched per type;
`retract` (Values.h:223) is a single vmapped chart update per type.

A `VectorValues` (the tangent / delta vector, reference
gtsam/linear/VectorValues.h:74) is simply {type_name: [N_t, dim_t] array}.

Values is a registered pytree: params are traced leaves; the key index is
static aux data, so jit caches per graph structure.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold

VectorValues = Dict[str, jnp.ndarray]


@jax.tree_util.register_pytree_node_class
class Values:
    def __init__(self, params=None, index=None, type_keys=None):
        # type -> stacked params pytree ([N_t, ...] leaves)
        self._params: Dict[str, Any] = dict(params) if params else {}
        # key -> (type_name, row)
        self._index: Dict[int, Tuple[str, int]] = dict(index) if index else {}
        # type -> ordered list of keys (row order)
        self._type_keys: Dict[str, List[int]] = (
            {t: list(ks) for t, ks in type_keys.items()} if type_keys else {}
        )
        # staging area for incremental host-side insertion
        self._pending: Dict[str, List[Any]] = {}

    # -- host-side construction ------------------------------------------

    def insert(self, key: int, type_name: str, value) -> "Values":
        """Insert a single value (host-side, mutating; cheap append)."""
        key = int(key)
        if key in self._index:
            raise KeyError(f"key {key} already in Values")
        row = self._count(type_name)
        self._index[key] = (type_name, row)
        self._type_keys.setdefault(type_name, []).append(key)
        self._pending.setdefault(type_name, []).append(value)
        return self

    def insert_batch(self, keys, type_name: str, stacked_params) -> "Values":
        """Insert many values of one type at once from an already-stacked
        params pytree (leaves [N, ...]). Avoids per-item staging — one device
        array in, no per-key ops (important under remote-device backends)."""
        keys = [int(k) for k in keys]
        base = self._count(type_name)
        for off, key in enumerate(keys):
            if key in self._index:
                raise KeyError(f"key {key} already in Values")
            self._index[key] = (type_name, base + off)
            self._type_keys.setdefault(type_name, []).append(key)
        # flush any pending singles of this type first to keep row order
        if self._pending.get(type_name):
            self._materialize()
        if type_name in self._params:
            self._params[type_name] = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, jnp.asarray(b)], axis=0),
                self._params[type_name],
                stacked_params,
            )
        else:
            self._params[type_name] = jax.tree_util.tree_map(
                jnp.asarray, stacked_params
            )
        return self

    def update(self, key: int, value) -> "Values":
        """Replace the value at an existing key."""
        t, row = self._index[int(key)]
        self._materialize()
        self._params[t] = jax.tree_util.tree_map(
            lambda a, v: a.at[row].set(v), self._params[t], value
        )
        return self

    def _count(self, t: str) -> int:
        n = len(self._pending.get(t, ()))
        if t in self._params:
            leaf = jax.tree_util.tree_leaves(self._params[t])[0]
            n += leaf.shape[0]
        return n

    def _materialize(self):
        if not self._pending:
            return
        for t, vals in self._pending.items():
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0), *vals
            )
            if t in self._params:
                self._params[t] = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b], axis=0),
                    self._params[t],
                    stacked,
                )
            else:
                self._params[t] = stacked
        self._pending = {}

    # -- queries ----------------------------------------------------------

    def __contains__(self, key: int) -> bool:
        return int(key) in self._index

    def __len__(self) -> int:
        return len(self._index)

    def keys(self):
        return self._index.keys()

    def type_of(self, key: int) -> str:
        return self._index[int(key)][0]

    def row_of(self, key: int) -> int:
        return self._index[int(key)][1]

    def type_keys(self, t: str) -> List[int]:
        return list(self._type_keys.get(t, ()))

    def types(self) -> List[str]:
        self._materialize()
        return list(self._params.keys())

    def params(self, t: str):
        self._materialize()
        return self._params[t]

    def at(self, key: int):
        """Single element params (device gather)."""
        t, row = self._index[int(key)]
        self._materialize()
        return jax.tree_util.tree_map(lambda a: a[row], self._params[t])

    def rows(self, keys, t: str) -> np.ndarray:
        """Host: rows of `keys` (all of type t) as an int32 array."""
        out = np.empty(len(keys), dtype=np.int32)
        for i, k in enumerate(keys):
            tt, row = self._index[int(k)]
            if tt != t:
                raise TypeError(f"key {k} has type {tt}, expected {t}")
            out[i] = row
        return out

    # -- tangent-space ops --------------------------------------------------

    def retract(self, delta: VectorValues) -> "Values":
        """x ⊞ delta per type (reference Values::retract, Values.h:223)."""
        self._materialize()
        new_params = {}
        for t, p in self._params.items():
            if t in delta:
                new_params[t] = manifold.get(t).retract(p, delta[t])
            else:
                new_params[t] = p
        return Values(new_params, self._index, self._type_keys)

    def local(self, other: "Values") -> VectorValues:
        """Tangent of `other` in the chart at self, per type."""
        self._materialize()
        other._materialize()
        return {
            t: manifold.get(t).local(p, other._params[t])
            for t, p in self._params.items()
        }

    def zero_delta(self, dtype=None) -> VectorValues:
        self._materialize()
        out = {}
        for t, p in self._params.items():
            leaf = jax.tree_util.tree_leaves(p)[0]
            n = leaf.shape[0]
            out[t] = jnp.zeros((n, manifold.get(t).dim), dtype=dtype or leaf.dtype)
        return out

    def total_dim(self) -> int:
        self._materialize()
        return sum(
            jax.tree_util.tree_leaves(p)[0].shape[0] * manifold.get(t).dim
            for t, p in self._params.items()
        )

    # -- pytree protocol ----------------------------------------------------

    def tree_flatten(self):
        self._materialize()
        types = tuple(sorted(self._params.keys()))
        children = tuple(self._params[t] for t in types)
        aux = (
            types,
            tuple(sorted((k, v) for k, v in self._index.items())),
            tuple((t, tuple(ks)) for t, ks in sorted(self._type_keys.items())),
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        types, index_items, type_keys_items = aux
        obj = cls.__new__(cls)
        obj._params = dict(zip(types, children))
        obj._index = dict(index_items)
        obj._type_keys = {t: list(ks) for t, ks in type_keys_items}
        obj._pending = {}
        return obj

    def __repr__(self):
        self._materialize()
        counts = {t: self._count(t) for t in self._params}
        return f"Values({counts})"
