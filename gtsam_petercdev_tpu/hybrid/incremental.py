"""Incremental hybrid inference with hypothesis pruning.

Reference: gtsam/hybrid/HybridSmoother.{h,cpp} (update = add factors,
re-eliminate, prune to maxNrLeaves) and gtsam/hybrid/HybridGaussianISAM.h
(the ISAM-style wrapper over the same machinery).

TPU-native design: instead of a DecisionTree of per-leaf Gaussians, the
LIVE hypothesis set (<= max_leaves pruned assignments) is the batch axis:
each update expands the set with any new discrete keys' cards, runs ONE
vmapped dense elimination over all hypotheses, renormalizes, and prunes
back. Per-update cost is O(max_leaves * card_new * D^3) regardless of how
many discrete keys the history holds — the same bound the reference gets
from pruned DecisionTrees, with the leaves batched instead of walked.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from gtsam_petercdev_tpu.hybrid.hybrid import (
    HybridBayesNet,
    HybridGaussianFactorGraph,
)


class HybridSmoother:
    """Incremental hybrid smoother with bounded hypothesis count."""

    def __init__(self, max_leaves: int = 8, dense_dim_limit: int = 96):
        # beyond dense_dim_limit total continuous dims, each hypothesis's
        # solve routes through the sparse multifrontal engine (shared
        # symbolic plan, hypotheses vmapped — hybrid/hybrid.eliminate_sparse)
        self.dense_dim_limit = int(dense_dim_limit)
        self.max_leaves = int(max_leaves)
        self.graph = HybridGaussianFactorGraph()
        self._hyp: Optional[np.ndarray] = None  # [K, n_disc] over sorted keys
        self._dkeys: List[int] = []
        self.bayes_net: Optional[HybridBayesNet] = None

    def update(self, new_graph: HybridGaussianFactorGraph) -> HybridBayesNet:
        """Add the new slice's factors, re-eliminate over the (expanded)
        live hypotheses, prune (HybridSmoother::update)."""
        # merge factors
        for t in new_graph.gaussians:
            self.graph.gaussians.append(t)
        for e in new_graph.discrete:
            self.graph.discrete.append(e)
        for k, dim in new_graph.cont_dims.items():
            self.graph.cont_dims[k] = dim
        new_keys = []
        for k, card in new_graph.disc_cards.items():
            if k not in self.graph.disc_cards:
                new_keys.append(k)
            self.graph.disc_cards[k] = card

        dkeys = sorted(self.graph.disc_cards.keys())
        if self._hyp is None or not self._dkeys:
            hyp = None  # first update: full grid over whatever exists
        else:
            # expand old hypotheses (over self._dkeys) with new keys' grids
            # vectorized expansion: [K, G, n_disc] by broadcasting the
            # kept hypotheses against the new keys' grid
            old_pos = {k: i for i, k in enumerate(self._dkeys)}
            new_pos = {k: i for i, k in enumerate(new_keys)}
            grids = [
                np.arange(self.graph.disc_cards[k], dtype=np.int64)
                for k in new_keys
            ]
            if grids:
                mesh = np.stack(
                    np.meshgrid(*grids, indexing="ij"), axis=-1
                ).reshape(-1, len(new_keys))
            else:
                mesh = np.zeros((1, 0), dtype=np.int64)
            K, G = self._hyp.shape[0], mesh.shape[0]
            hyp = np.empty((K, G, len(dkeys)), dtype=np.int64)
            for j, k in enumerate(dkeys):
                if k in old_pos:
                    hyp[:, :, j] = self._hyp[:, old_pos[k]][:, None]
                else:
                    hyp[:, :, j] = mesh[:, new_pos[k]][None, :]
            hyp = hyp.reshape(K * G, len(dkeys))

        _, D = self.graph._cont_offsets()
        if D > self.dense_dim_limit:
            from gtsam_petercdev_tpu.hybrid.hybrid import eliminate_sparse

            bn = eliminate_sparse(self.graph, assignments=hyp)
        else:
            bn = self.graph.eliminate(assignments=hyp)
        bn = bn.prune(self.max_leaves)
        self._hyp = bn.assignments
        self._dkeys = list(dkeys)
        self.bayes_net = bn
        return bn

    def optimize(self):
        return self.bayes_net.optimize()

    def discrete_marginal(self, key: int) -> np.ndarray:
        return self.bayes_net.discrete_marginal(key)


class HybridGaussianISAM(HybridSmoother):
    """ISAM-style alias: same pruned-hypothesis incremental machinery
    (HybridGaussianISAM.h exposes update(newFactors) like ISAM)."""

    pass
