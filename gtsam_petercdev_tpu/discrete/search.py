"""DiscreteSearch: k-best assignments of a discrete factor graph.

Reference: gtsam/discrete/DiscreteSearch.{h,cpp} — best-first search over the
elimination order returning the K most-probable-explanations. Here the search
is a BEAM over variables in elimination order, expanding each partial
assignment with every value of the next variable and keeping the `beam` best
upper-bounded partials (bound: product of each remaining factor's max over
unassigned vars, an admissible heuristic).

NOTE on exactness: unlike the reference's best-first search, a finite beam
may prune the true optimum — results are exact only when `beam` is at least
the number of surviving partials at every level (guaranteed when
beam >= prod(cards)); otherwise this is an approximate anytime search.
Callers needing guaranteed-exact K-best should raise `beam` (the default
test configs use exhaustive beams).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gtsam_petercdev_tpu.discrete.discrete import DiscreteFactorGraph


@dataclass
class SearchSolution:
    assignment: Dict[int, int]
    value: float  # unnormalized probability


def k_best(
    graph: DiscreteFactorGraph,
    K: int,
    ordering: Optional[Sequence[int]] = None,
    beam: int = 0,
) -> List[SearchSolution]:
    """Return K best assignments, best first (DiscreteSearch::run)."""
    keys = list(ordering) if ordering is not None else graph.all_keys()
    factors = [(f.keys, np.asarray(f.table)) for f in graph.factors]
    # admissible per-factor upper bound given a partial assignment: max over
    # the unassigned axes of the factor restricted to the assigned ones
    beam = beam if beam > 0 else max(64, 8 * K)

    def bound(partial: Dict[int, int]) -> float:
        b = 1.0
        for fkeys, tab in factors:
            idx = tuple(
                partial[k] if k in partial else slice(None) for k in fkeys
            )
            sub = tab[idx]
            b *= float(np.max(sub)) if getattr(sub, "ndim", 0) else float(sub)
        return b

    frontier: List[Tuple[float, Dict[int, int]]] = [(bound({}), {})]
    for var in keys:
        card = graph.cards[var]
        nxt: List[Tuple[float, Dict[int, int]]] = []
        for _, partial in frontier:
            for v in range(card):
                p2 = dict(partial)
                p2[var] = v
                nxt.append((bound(p2), p2))
        nxt.sort(key=lambda x: -x[0])
        frontier = nxt[: max(beam, K)]
    # fully assigned: bound == exact value
    out = [SearchSolution(p, b) for b, p in frontier[:K]]
    return out
