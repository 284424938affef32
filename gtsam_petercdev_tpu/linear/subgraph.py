"""Spanning-tree subgraph preconditioning.

TPU-native analog of the reference's subgraph preconditioned conjugate
gradient stack: `SubgraphBuilder` (gtsam/linear/SubgraphBuilder.h:109-170)
selects a spanning tree/subgraph of the factor graph, `SubgraphPreconditioner`
(gtsam/linear/SubgraphPreconditioner.h) solves the tree part exactly, and
`SubgraphSolver` (gtsam/linear/SubgraphSolver.h:88) runs PCG on the full
system with that preconditioner.

Here the tree subsystem is factorized ONCE per outer iteration through the
same supernodal multifrontal engine as the full solver (tree graphs produce
tiny cliques; levels = tree depth), and each PCG application is a pair of
batched triangular level sweeps. The spanning tree comes from Kruskal over
the binary-factor skeleton (gtsam/base/kruskal.h) using a DSF union-find.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.inference import elimination
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import LinearizedGraph
from gtsam_petercdev_tpu.utils.dsf import DSFVector


def kruskal_max_spanning_tree(
    n: int, u: np.ndarray, v: np.ndarray, weights: Optional[np.ndarray] = None
) -> np.ndarray:
    """Indices of edges forming a maximum-weight spanning forest.

    The analog of gtsam/base/kruskal.h (utils::kruskal): sort edges by
    descending weight, greedily add those joining distinct components.
    """
    u = np.asarray(u, dtype=np.int64).ravel()
    v = np.asarray(v, dtype=np.int64).ravel()
    if weights is None:
        order = np.arange(u.shape[0])
    else:
        order = np.argsort(-np.asarray(weights), kind="stable")
    dsf = DSFVector(n)
    picked = []
    for e in order:
        if dsf.union(int(u[e]), int(v[e])):
            picked.append(int(e))
            if len(picked) == n - 1:
                break
    return np.asarray(picked, dtype=np.int64)


@dataclass
class SubgraphBuilderParams:
    """Mirrors SubgraphBuilderParameters (SubgraphBuilder.h:65-107): the
    skeleton is the Kruskal spanning tree; `augmentation_factor` adds that
    fraction of the strongest off-tree edges back into the subgraph."""

    augmentation_factor: float = 0.0


def build_subgraph(
    lg: LinearizedGraph, params: SubgraphBuilderParams = SubgraphBuilderParams()
) -> List[np.ndarray]:
    """Per linear batch, boolean mask of factors kept in the subgraph.

    Unary factors are always kept (they anchor the tree system); binary
    factors are kept iff on the spanning tree (+ augmentation).
    """
    t = _single_type(lg)
    n = lg.type_counts[t]
    if any(lb.sign != 1.0 for lb in lg.batches):
        raise NotImplementedError(
            "subgraph preconditioner does not support sign=-1 (AntiFactor) "
            "batches; use the dense or multifrontal solver"
        )
    edges = []  # (batch index, row index, u, v, weight)
    for bi, lb in enumerate(lg.batches):
        if len(lb.var_types) == 2:
            w = np.asarray(jnp.sum(lb.b * lb.b, axis=-1))  # strength proxy
            for r in range(lb.rows[0].shape[0]):
                edges.append((bi, r, int(lb.rows[0][r]), int(lb.rows[1][r]), w[r]))
    masks = [np.zeros(lb.rows[0].shape[0], dtype=bool) for lb in lg.batches]
    for bi, lb in enumerate(lg.batches):
        if len(lb.var_types) == 1:
            masks[bi][:] = True
    if edges:
        uu = np.array([e[2] for e in edges])
        vv = np.array([e[3] for e in edges])
        ww = np.array([e[4] for e in edges])
        tree = set(kruskal_max_spanning_tree(n, uu, vv, ww).tolist())
        if params.augmentation_factor > 0:
            off = [i for i in range(len(edges)) if i not in tree]
            off.sort(key=lambda i: -ww[i])
            extra = int(params.augmentation_factor * len(tree))
            tree |= set(off[:extra])
        for ei in tree:
            bi, r = edges[ei][0], edges[ei][1]
            masks[bi][r] = True
    return masks


def _single_type(lg: LinearizedGraph) -> str:
    types = sorted(lg.type_counts.keys())
    if len(types) != 1:
        raise NotImplementedError("subgraph preconditioner: one variable type")
    return types[0]


def _masked_subgraph_arrays(lg: LinearizedGraph, masks) -> Tuple[list, list]:
    """Compact (rows, (A, b)) per batch keeping only masked factors."""
    struct, Ab = [], []
    for lb, m in zip(lg.batches, masks):
        idx = np.flatnonzero(m)
        if idx.size == 0:
            continue
        rows = tuple(np.asarray(r)[idx] for r in lb.rows)
        struct.append((rows, lb.var_types[0]))
        A = tuple(a[jnp.asarray(idx)] for a in lb.A)
        Ab.append((A, lb.b[jnp.asarray(idx)]))
    return struct, Ab


class SubgraphSolver:
    """PCG on the full linearized system, preconditioned by an exact solve of
    the spanning-tree subsystem (SubgraphSolver.h:88).

    Usage: sol = SubgraphSolver(lg); x = sol.solve(lam) -> VectorValues.
    """

    def __init__(
        self,
        lg: LinearizedGraph,
        params: SubgraphBuilderParams = SubgraphBuilderParams(),
    ):
        self.lg = lg
        self.t = _single_type(lg)
        from gtsam_petercdev_tpu.core import manifold

        self.d = manifold.get(self.t).dim
        n = lg.type_counts[self.t]
        masks = build_subgraph(lg, params)
        struct, self.tree_Ab = _masked_subgraph_arrays(lg, masks)
        bstruct = [
            elimination.BatchStructure(
                (self.d,) * len(rows),
                tuple(np.asarray(r, np.int64) for r in rows),
                1.0,
            )
            for rows, _ in struct
        ]
        plan = elimination.build_plan_for_graph(bstruct, n, self.d)
        self.maps = elimination.build_numeric_maps(plan, bstruct)

    def solve(self, lam=0.0, tol: float = 1e-8, max_iters: int = 500):
        chol = elimination.multifrontal_factor(self.maps, self.tree_Ab, lam)
        t = self.t

        def Minv(r):
            x = elimination.multifrontal_apply(self.maps, chol, r[t])
            return {t: x}

        g = linsolve.gradient(self.lg)
        lamj = jnp.asarray(lam, dtype=g[t].dtype)

        def A(v):
            base = linsolve.hvp(self.lg, v)
            return {t: base[t] + lamj * v[t]}

        return linsolve.pcg(A, g, Minv, tol=tol, max_iters=max_iters)
