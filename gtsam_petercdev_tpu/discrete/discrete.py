"""Discrete factor graphs: dense-tensor potentials + einsum elimination.

Reference: gtsam/discrete/ — DecisionTreeFactor (DecisionTree.h:62 ADD with
leaf merging), DiscreteFactorGraph.h:53-99 (EliminateDiscrete sum-product /
EliminateForMPE max-product), DiscreteConditional, DiscreteBayesNet,
DiscreteMarginals.

TPU-native design: a factor over variables (v1..vk) with cardinalities
(c1..ck) is ONE dense tensor of shape (c1,...,ck). The reference's ADD
(algebraic decision diagram) compresses repeated leaves for CPU traversal;
on TPU the dense tensor IS the right layout — products are broadcast
multiplies, elimination is a sum/max reduction over one axis, both fused by
XLA. Cardinalities in robotics use-cases are tiny (2-10), so density costs
little and buys full vectorization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiscreteFactor:
    """Potential phi(v1..vk) as a dense tensor.

    keys: variable ids, in tensor-axis order. table.shape[i] = card(keys[i]).
    """

    keys: Tuple[int, ...]
    table: jnp.ndarray

    @property
    def cards(self) -> Tuple[int, ...]:
        return tuple(self.table.shape)

    def value(self, assignment: Dict[int, int]) -> float:
        idx = tuple(assignment[k] for k in self.keys)
        return float(self.table[idx])

    def normalized(self) -> "DiscreteFactor":
        s = jnp.sum(self.table)
        return DiscreteFactor(self.keys, self.table / jnp.where(s == 0, 1.0, s))


@dataclass(frozen=True)
class DiscreteConditional:
    """P(frontal | parents) — frontal is axis 0, parents follow.

    For max-product elimination, `argmax` holds argmax_frontal over the
    parents' assignment grid (shape = parent cards) enabling MPE backtrack.
    """

    frontal: int
    parents: Tuple[int, ...]
    table: jnp.ndarray  # [card_frontal, *parent_cards]
    argmax: Optional[jnp.ndarray] = None  # [*parent_cards] int32

    def choose(self, assignment: Dict[int, int]) -> jnp.ndarray:
        idx = tuple(assignment[p] for p in self.parents)
        return self.table[(slice(None),) + idx]


def _align(f: DiscreteFactor, all_keys: Tuple[int, ...], cards: Dict[int, int]):
    """Broadcast f.table to the axis order of all_keys."""
    shape = [1] * len(all_keys)
    perm_src = []
    for k in f.keys:
        perm_src.append(all_keys.index(k))
    t = f.table
    # move axes into target positions
    out_shape = [1] * len(all_keys)
    for ax_src, ax_dst in enumerate(perm_src):
        out_shape[ax_dst] = t.shape[ax_src]
    order = np.argsort(perm_src, kind="stable")
    t = jnp.transpose(t, tuple(order))
    return t.reshape(tuple(out_shape))


def product(factors: Sequence[DiscreteFactor], cards: Dict[int, int]) -> DiscreteFactor:
    """Pointwise product over the union scope (DecisionTreeFactor::operator*)."""
    all_keys = tuple(sorted({k for f in factors for k in f.keys}))
    full_shape = tuple(cards[k] for k in all_keys)
    out = jnp.ones(full_shape, dtype=factors[0].table.dtype)
    for f in factors:
        out = out * _align(f, all_keys, cards)
    return DiscreteFactor(all_keys, out)


def eliminate_one(
    factors: List[DiscreteFactor],
    var: int,
    cards: Dict[int, int],
    op: str = "sum",
) -> Tuple[DiscreteConditional, Optional[DiscreteFactor], List[DiscreteFactor]]:
    """Eliminate `var`: multiply its factors, reduce over its axis.

    Returns (conditional, separator_factor_or_None, remaining_factors).
    op='sum' -> EliminateDiscrete (DiscreteFactorGraph.h:53);
    op='max' -> EliminateForMPE (:66).
    """
    involved = [f for f in factors if var in f.keys]
    remaining = [f for f in factors if var not in f.keys]
    if not involved:
        raise KeyError(f"variable {var} not in graph")
    joint = product(involved, cards)
    ax = joint.keys.index(var)
    # move frontal to axis 0
    t = jnp.moveaxis(joint.table, ax, 0)
    parents = tuple(k for k in joint.keys if k != var)
    if op == "sum":
        marg = jnp.sum(t, axis=0)
        argm = None
    else:
        marg = jnp.max(t, axis=0)
        argm = jnp.argmax(t, axis=0).astype(jnp.int32)
    denom = jnp.where(marg == 0, 1.0, marg)
    cond_table = t / denom  # P(var | parents)
    cond = DiscreteConditional(var, parents, cond_table, argm)
    sep = DiscreteFactor(parents, marg) if parents else None
    if sep is None:
        # record the normalization constant implicitly; scalar dropped
        pass
    return cond, sep, remaining


@dataclass
class DiscreteBayesNet:
    conditionals: List[DiscreteConditional]  # elimination order

    def optimize(self) -> Dict[int, int]:
        """MPE assignment by reverse traversal. Valid when produced by
        max-product elimination (DiscreteLookupDAG::argmax); with
        sum-product conditionals this is the sequential argmax heuristic
        (DiscreteBayesNet::optimize semantics)."""
        assignment: Dict[int, int] = {}
        for cond in reversed(self.conditionals):
            if cond.argmax is not None:
                idx = tuple(assignment[p] for p in cond.parents)
                assignment[cond.frontal] = int(cond.argmax[idx])
            else:
                probs = cond.choose(assignment)
                assignment[cond.frontal] = int(jnp.argmax(probs))
        return assignment

    def sample(self, rng: np.random.Generator) -> Dict[int, int]:
        assignment: Dict[int, int] = {}
        for cond in reversed(self.conditionals):
            probs = np.asarray(cond.choose(assignment))
            probs = probs / probs.sum()
            assignment[cond.frontal] = int(rng.choice(len(probs), p=probs))
        return assignment

    def evaluate(self, assignment: Dict[int, int]) -> float:
        p = 1.0
        for cond in self.conditionals:
            idx = (assignment[cond.frontal],) + tuple(
                assignment[pk] for pk in cond.parents
            )
            p *= float(cond.table[idx])
        return p


class DiscreteFactorGraph:
    """Factor container + elimination front-door (DiscreteFactorGraph.h:99)."""

    def __init__(self):
        self.factors: List[DiscreteFactor] = []
        self.cards: Dict[int, int] = {}

    def add(self, keys_cards: Sequence[Tuple[int, int]], table) -> "DiscreteFactorGraph":
        """keys_cards: [(key, cardinality), ...]; table: array or flat list
        in row-major order over those cardinalities (DecisionTreeFactor ctor)."""
        keys = tuple(k for k, _ in keys_cards)
        cards = tuple(c for _, c in keys_cards)
        for k, c in keys_cards:
            if self.cards.setdefault(k, c) != c:
                raise ValueError(f"cardinality mismatch for {k}")
        t = jnp.asarray(table, dtype=jnp.float64).reshape(cards)
        self.factors.append(DiscreteFactor(keys, t))
        return self

    def all_keys(self) -> List[int]:
        return sorted({k for f in self.factors for k in f.keys})

    def eliminate_sequential(
        self, ordering: Optional[Sequence[int]] = None, op: str = "sum"
    ) -> DiscreteBayesNet:
        ordering = list(ordering) if ordering is not None else self.all_keys()
        factors = list(self.factors)
        conds = []
        for var in ordering:
            cond, sep, factors = eliminate_one(factors, var, self.cards, op)
            conds.append(cond)
            if sep is not None:
                factors.append(sep)
        return DiscreteBayesNet(conds)

    def optimize(self, ordering: Optional[Sequence[int]] = None) -> Dict[int, int]:
        """MPE via max-product elimination + backtrack
        (DiscreteFactorGraph::optimize)."""
        return self.eliminate_sequential(ordering, op="max").optimize()

    def joint(self) -> DiscreteFactor:
        return product(self.factors, self.cards)

    def marginal(self, key: int) -> jnp.ndarray:
        """P(key) by sum-product elimination of all other variables
        (DiscreteMarginals semantics)."""
        others = [k for k in self.all_keys() if k != key]
        factors = list(self.factors)
        for var in others:
            _, sep, factors = eliminate_one(factors, var, self.cards, "sum")
            if sep is not None:
                factors.append(sep)
        joint = product(factors, self.cards) if factors else None
        t = jnp.squeeze(joint.table) if joint is not None else jnp.ones((self.cards[key],))
        t = t.reshape(self.cards[key])
        return t / jnp.sum(t)

    def evaluate(self, assignment: Dict[int, int]) -> float:
        p = 1.0
        for f in self.factors:
            p *= f.value(assignment)
        return p


def signature_table(spec: str, card_frontal: int, parent_cards: Sequence[int]):
    """Parse a reference-style Signature spec: rows of frontal ratios per
    parent assignment, e.g. "4/1 1/4" for one binary parent
    (discrete/Signature.h). Rows are row-major over parents."""
    rows = spec.strip().split()
    tables = []
    for row in rows:
        vals = np.asarray([float(x) for x in row.split("/")])
        if len(vals) != card_frontal:
            raise ValueError(f"row {row} has {len(vals)} entries, expected {card_frontal}")
        tables.append(vals / vals.sum())
    arr = np.stack(tables, axis=0)  # [n_parent_asgn, card_frontal]
    shape = tuple(parent_cards) + (card_frontal,)
    arr = arr.reshape(shape)
    # reorder to (frontal, *parents)
    arr = np.moveaxis(arr, -1, 0)
    return arr
