"""Hybrid (conditional linear-Gaussian) factor graphs.

Reference: gtsam/hybrid/ — HybridGaussianFactor (a discrete-indexed
collection of Gaussian factors), HybridGaussianFactorGraph with
EliminateHybrid (HybridGaussianFactorGraph.cpp:291-618 dispatching
discrete-only / continuous-only / mixture elimination), HybridBayesNet with
prune(maxNrLeaves) (HybridBayesNet.h:229).

TPU-native redesign: instead of the reference's DecisionTree-of-factors with
per-leaf dynamic dispatch, the discrete ASSIGNMENT GRID becomes a batch
axis. All Gaussian eliminations for all assignments run as ONE vmapped
dense solve; the discrete posterior comes from the standard CLG evidence
  P(m) ∝ phi_disc(m) * exp(-E(m)) / sqrt(det H(m)),
E(m) = min_x 0.5||A(m) x - b(m)||^2 — exactly the model-selection constant
the reference tracks via the conditionals' normalization terms. Pruning
keeps the top-K assignments (HybridBayesNet::prune analog).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class _GaussianTerm:
    """sum_k A_k x_{c_k} - b, rows whitened. cont_keys: which continuous
    vars; A: [d, dim_k] per key; hybrid terms additionally carry leading
    assignment axes over their disc_keys."""

    cont_keys: Tuple[int, ...]
    A: Tuple[jnp.ndarray, ...]
    b: jnp.ndarray
    disc_keys: Tuple[int, ...] = ()
    # log of the noise-model normalizer log det(R) (per assignment for
    # hybrid terms) — the scalar the reference pairs with each component
    # (HybridGaussianFactor) so mixtures with different noise models
    # compare correctly in the discrete posterior.
    log_norm: jnp.ndarray = 0.0


class HybridGaussianFactorGraph:
    """Mixed graph: continuous Gaussian terms, discrete potentials, and
    discrete-indexed Gaussian mixtures."""

    def __init__(self):
        self.cont_dims: Dict[int, int] = {}
        self.disc_cards: Dict[int, int] = {}
        self.gaussians: List[_GaussianTerm] = []
        self.discrete: List[Tuple[Tuple[int, ...], jnp.ndarray]] = []

    # --- construction ----------------------------------------------------

    def add_continuous(
        self, keys_dims: Sequence[Tuple[int, int]], A_blocks, b, log_norm=0.0
    ):
        """Whitened Gaussian factor sum_k A_k x_k = b."""
        keys = tuple(k for k, _ in keys_dims)
        for k, d in keys_dims:
            if self.cont_dims.setdefault(k, d) != d:
                raise ValueError(f"dim mismatch for continuous var {k}")
        self.gaussians.append(
            _GaussianTerm(
                keys,
                tuple(jnp.asarray(a) for a in A_blocks),
                jnp.asarray(b),
                (),
                jnp.asarray(log_norm, jnp.float64),
            )
        )
        return self

    def add_discrete(self, keys_cards: Sequence[Tuple[int, int]], table):
        keys = tuple(k for k, _ in keys_cards)
        cards = tuple(c for _, c in keys_cards)
        for k, c in keys_cards:
            if self.disc_cards.setdefault(k, c) != c:
                raise ValueError(f"cardinality mismatch for discrete var {k}")
        self.discrete.append((keys, jnp.asarray(table, jnp.float64).reshape(cards)))
        return self

    def add_hybrid(
        self,
        cont_keys_dims: Sequence[Tuple[int, int]],
        disc_keys_cards: Sequence[Tuple[int, int]],
        A_blocks,  # per cont key: [*cards, d, dim_k]
        b,  # [*cards, d]
        log_norm=None,  # [*cards] log det(R) per assignment (default 0)
    ):
        """HybridGaussianFactor: one Gaussian per discrete assignment."""
        ckeys = tuple(k for k, _ in cont_keys_dims)
        dkeys = tuple(k for k, _ in disc_keys_cards)
        for k, d in cont_keys_dims:
            if self.cont_dims.setdefault(k, d) != d:
                raise ValueError(f"dim mismatch for continuous var {k}")
        for k, c in disc_keys_cards:
            if self.disc_cards.setdefault(k, c) != c:
                raise ValueError(f"cardinality mismatch for discrete var {k}")
        cards = tuple(c for _, c in disc_keys_cards)
        ln = (
            jnp.zeros(cards, jnp.float64)
            if log_norm is None
            else jnp.asarray(log_norm, jnp.float64).reshape(cards)
        )
        self.gaussians.append(
            _GaussianTerm(
                ckeys,
                tuple(jnp.asarray(a) for a in A_blocks),
                jnp.asarray(b),
                dkeys,
                ln,
            )
        )
        return self

    # --- elimination ------------------------------------------------------

    def _cont_offsets(self):
        keys = sorted(self.cont_dims.keys())
        off = {}
        D = 0
        for k in keys:
            off[k] = D
            D += self.cont_dims[k]
        return off, D

    def _assignments(self):
        dkeys = sorted(self.disc_cards.keys())
        grids = [range(self.disc_cards[k]) for k in dkeys]
        return dkeys, list(itertools.product(*grids))

    def _log_phi(self, asg_arr, dkeys):
        """Discrete potentials + noise-model normalizers per assignment."""
        M = asg_arr.shape[0]
        log_phi = jnp.zeros((M,), dtype=jnp.float64)
        idx_of = {k: i for i, k in enumerate(dkeys)}
        for keys, table in self.discrete:
            cols = [idx_of[k] for k in keys]
            vals = table[tuple(jnp.asarray(asg_arr[:, c]) for c in cols)]
            log_phi = log_phi + jnp.log(jnp.maximum(vals, 1e-300))
        for t in self.gaussians:
            if t.disc_keys:
                cols = [idx_of[k] for k in t.disc_keys]
                log_phi = log_phi + t.log_norm[
                    tuple(jnp.asarray(asg_arr[:, c]) for c in cols)
                ]
            else:
                log_phi = log_phi + t.log_norm
        return log_phi

    def eliminate(self, assignments=None) -> "HybridBayesNet":
        """Hybrid elimination: vmapped dense Gaussian solve per assignment +
        discrete posterior from the CLG evidence.

        assignments: optional [M, n_disc] RESTRICTED hypothesis set over the
        sorted discrete keys (the pruned-hypothesis incremental path,
        hybrid/incremental.py); None = the full grid."""
        off, D = self._cont_offsets()
        if assignments is None:
            dkeys, assignments = self._assignments()
            M = len(assignments)
            asg_arr = np.asarray(assignments, dtype=np.int64).reshape(
                M, len(dkeys)
            )
        else:
            dkeys = sorted(self.disc_cards.keys())
            asg_arr = np.asarray(assignments, dtype=np.int64)
            M = asg_arr.shape[0]

        def system_for(asg):
            """Dense (H, g, e_const) for one discrete assignment (traced)."""
            H = jnp.zeros((D, D), dtype=jnp.float64)
            g = jnp.zeros((D,), dtype=jnp.float64)
            c = jnp.zeros((), dtype=jnp.float64)
            idx_of = {k: i for i, k in enumerate(dkeys)}
            for t in self.gaussians:
                A = t.A
                b = t.b
                if t.disc_keys:
                    sel = tuple(asg[idx_of[k]] for k in t.disc_keys)
                    A = tuple(a[sel] for a in A)
                    b = b[sel]
                spans = [
                    jnp.arange(off[k], off[k] + self.cont_dims[k]) for k in t.cont_keys
                ]
                for i, ki in enumerate(t.cont_keys):
                    g = g.at[spans[i]].add(A[i].T @ b)
                    for j, kj in enumerate(t.cont_keys):
                        H = H.at[spans[i][:, None], spans[j][None, :]].add(A[i].T @ A[j])
                c = c + 0.5 * jnp.dot(b, b)
            return H, g, c

        def solve_one(asg):
            H, g, c = system_for(asg)
            Hr = H + 1e-10 * jnp.eye(D, dtype=jnp.float64)
            L = jnp.linalg.cholesky(Hr)
            x = jax.scipy.linalg.cho_solve((L, True), g)
            E = c - 0.5 * jnp.dot(g, x)  # min_x 0.5||Ax-b||^2
            logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
            return x, E, logdet

        if D > 0:
            xs, Es, logdets = jax.vmap(solve_one)(jnp.asarray(asg_arr))
        else:
            xs = jnp.zeros((M, 0))
            Es = jnp.zeros((M,))
            logdets = jnp.zeros((M,))

        log_phi = self._log_phi(asg_arr, dkeys)

        # CLG evidence: log P(m) = log phi - E(m) - 0.5 log det H(m) + const
        logp = log_phi - Es - 0.5 * logdets
        logp = logp - jax.scipy.special.logsumexp(logp)
        return HybridBayesNet(
            disc_keys=tuple(dkeys),
            assignments=asg_arr,
            log_probs=np.asarray(logp),
            cont_offsets=off,
            cont_dims=dict(self.cont_dims),
            solutions=np.asarray(xs),
        )


@dataclass
class HybridBayesNet:
    """Posterior: discrete distribution over assignments + the optimal
    continuous solution per assignment (HybridBayesNet semantics)."""

    disc_keys: Tuple[int, ...]
    assignments: np.ndarray  # [M, n_disc]
    log_probs: np.ndarray  # [M] normalized
    cont_offsets: Dict[int, int]
    cont_dims: Dict[int, int]
    solutions: np.ndarray  # [M, D]

    def optimize(self) -> Tuple[Dict[int, int], Dict[int, np.ndarray]]:
        """MPE discrete assignment + its continuous solution
        (HybridBayesNet::optimize)."""
        best = int(np.argmax(self.log_probs))
        asg = {k: int(self.assignments[best, i]) for i, k in enumerate(self.disc_keys)}
        x = self.solutions[best]
        cont = {
            k: x[o : o + self.cont_dims[k]] for k, o in self.cont_offsets.items()
        }
        return asg, cont

    def discrete_marginal(self, key: int) -> np.ndarray:
        i = self.disc_keys.index(key)
        card = int(self.assignments[:, i].max()) + 1
        out = np.zeros(card)
        p = np.exp(self.log_probs)
        for m in range(len(p)):
            out[self.assignments[m, i]] += p[m]
        return out

    def prune(self, max_leaves: int) -> "HybridBayesNet":
        """Keep the top-K assignments (HybridBayesNet::prune, .h:229)."""
        order = np.argsort(-self.log_probs)[:max_leaves]
        lp = self.log_probs[order]
        lp = lp - (np.log(np.sum(np.exp(lp - lp.max()))) + lp.max())  # renormalize
        return HybridBayesNet(
            self.disc_keys,
            self.assignments[order],
            lp,
            self.cont_offsets,
            self.cont_dims,
            self.solutions[order],
        )


# ---------------------------------------------------------------------------
# sparse per-hypothesis elimination (Hybrid_City10000 scale)
# ---------------------------------------------------------------------------


def eliminate_sparse(
    graph: HybridGaussianFactorGraph, assignments=None
) -> "HybridBayesNet":
    """Same posterior as graph.eliminate(), with each hypothesis's continuous
    solve routed through the SPARSE multifrontal engine: all hypotheses share
    one symbolic plan (identical structure, different theta) and run as a
    vmapped batch (HybridGaussianFactorGraph.cpp:536-618's per-leaf
    elimination, batched instead of walked). Use when the continuous
    dimension outgrows the dense path (Hybrid_City10000-style problems)."""
    from gtsam_petercdev_tpu.inference import elimination

    off, D = graph._cont_offsets()
    dkeys = sorted(graph.disc_cards.keys())
    if assignments is None:
        _, assignments = graph._assignments()
        asg_arr = np.asarray(assignments, dtype=np.int64).reshape(
            len(assignments), len(dkeys)
        )
    else:
        asg_arr = np.asarray(assignments, dtype=np.int64)
    M = asg_arr.shape[0]
    idx_of = {k: i for i, k in enumerate(dkeys)}

    ckeys = sorted(graph.cont_dims.keys())
    gid_of = {k: i for i, k in enumerate(ckeys)}
    n = len(ckeys)
    d = max(graph.cont_dims.values())
    var_dims = np.asarray([graph.cont_dims[k] for k in ckeys], dtype=np.int64)

    # group terms by (cont dims, resid dim, disc cards) -> stacked batches
    groups: Dict[Tuple, Dict] = {}
    for t in graph.gaussians:
        dims = tuple(graph.cont_dims[k] for k in t.cont_keys)
        cards = tuple(graph.disc_cards[k] for k in t.disc_keys)
        key = (dims, int(t.b.shape[-1]), cards)
        g = groups.setdefault(
            key, {"A": [], "b": [], "gids": [], "dcols": []}
        )
        if cards:
            cflat = int(np.prod(cards))
            g["A"].append(tuple(a.reshape((cflat,) + a.shape[-2:]) for a in t.A))
            g["b"].append(t.b.reshape(cflat, -1))
        else:
            g["A"].append(tuple(t.A))
            g["b"].append(t.b)
        g["gids"].append([gid_of[k] for k in t.cont_keys])
        g["dcols"].append([idx_of[k] for k in t.disc_keys])

    structure, batches = [], []
    for (dims, rd, cards), g in groups.items():
        N = len(g["b"])
        A = tuple(
            jnp.stack([a[k] for a in g["A"]], axis=0) for k in range(len(dims))
        )
        b = jnp.stack(g["b"], axis=0)
        gids = np.asarray(g["gids"], dtype=np.int64)  # [N, K]
        structure.append(
            elimination.BatchStructure(
                dims, tuple(gids[:, k] for k in range(len(dims))), 1.0
            )
        )
        strides = np.cumprod((cards + (1,))[::-1])[::-1][1:] if cards else None
        dcols = np.asarray(g["dcols"], dtype=np.int64) if cards else None
        batches.append((A, b, gids, dims, strides, dcols))

    plan = elimination.build_plan_for_graph(structure, n, d)
    maps = elimination.build_numeric_maps(plan, structure, var_dims=var_dims)

    def solve_h(asg_row):
        Ab = []
        resid_terms = []
        for (A, b, gids, dims, strides, dcols) in batches:
            if strides is not None:
                sel = jnp.zeros(gids.shape[0], dtype=jnp.int32)
                for j in range(dcols.shape[1]):
                    sel = sel + (
                        asg_row[jnp.asarray(dcols[:, j])] * int(strides[j])
                    ).astype(jnp.int32)
                Asel = tuple(
                    Ak[jnp.arange(gids.shape[0]), sel] for Ak in A
                )
                bsel = b[jnp.arange(gids.shape[0]), sel]
            else:
                Asel, bsel = A, b
            Ab.append((Asel, bsel))
            resid_terms.append((Asel, bsel, gids, dims))
        x, stats = elimination._multifrontal_solve_impl(
            maps, tuple(Ab), 1e-10, return_logdet=True
        )
        E = jnp.zeros((), jnp.float64)
        for (Asel, bsel, gids, dims) in resid_terms:
            r = bsel
            for k in range(len(dims)):
                xk = x[jnp.asarray(gids[:, k]), : dims[k]]
                r = r - jnp.einsum("nrk,nk->nr", Asel[k], xk)
            E = E + 0.5 * jnp.sum(r * r)
        # flatten x into the dense offsets layout
        xs = jnp.concatenate(
            [x[gid_of[k], : graph.cont_dims[k]] for k in ckeys]
        ) if ckeys else jnp.zeros((0,))
        return xs, E, stats["logdet"]

    xs, Es, logdets = jax.vmap(solve_h)(jnp.asarray(asg_arr))
    log_phi = graph._log_phi(asg_arr, dkeys)
    logp = log_phi - Es - 0.5 * logdets
    logp = logp - jax.scipy.special.logsumexp(logp)
    return HybridBayesNet(
        disc_keys=tuple(dkeys),
        assignments=asg_arr,
        log_probs=np.asarray(logp),
        cont_offsets=off,
        cont_dims=dict(graph.cont_dims),
        solutions=np.asarray(xs),
    )
