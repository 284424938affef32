"""Marginal covariances (reference: gtsam/nonlinear/Marginals.h:37-128).

The reference factorizes the full linearized graph once into a
GaussianBayesTree and answers marginal queries via clique shortcut marginals
(BayesTreeCliqueBase.h:172-203). The TPU-native analog factorizes the dense
Hessian H = J^T J once (one Cholesky on device), then answers each query
`Sigma_kk = (H^{-1})_kk` by a triangular solve on the key's d columns — the
same cost profile (one factorization, cheap per-key queries), with device
batching across simultaneous queries.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


class Marginals:
    """method="dense": factorize the dense Hessian once (small/medium).
    method="tree": build a Bayes tree via the incremental engine and run
    the top-down covariance sweep (inference/treemarg.py) — the reference's
    clique-shortcut scheme, right for large sparse graphs."""

    def __init__(
        self, graph: NonlinearFactorGraph, values: Values, method: str = "dense"
    ):
        graph._materialize()
        values._materialize()
        self._values = values
        self._tree = None
        if method == "tree":
            from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params

            isam = ISAM2(
                ISAM2Params(
                    enable_relinearization=False, wildfire_threshold=0.0
                )
            )
            isam.update(graph, values)
            self._tree = isam
            return
        lg = graph.linearize(values)
        self._lg = lg
        self._off, self._D = linsolve.offsets(lg)
        H, _ = linsolve.assemble_dense(lg)
        # tiny jitter guards rank-deficient gauge directions, mirroring
        # choleskyCareful's underconstrained handling (base/cholesky.cpp:30-73)
        self._chol = jax.scipy.linalg.cho_factor(
            H + 1e-10 * jnp.eye(self._D, dtype=H.dtype), lower=True
        )
        self._H = H

    def _slice(self, key: int):
        t = self._values.type_of(key)
        row = self._values.row_of(key)
        d = manifold.get(t).dim
        start = self._off[t] + row * d
        return start, d

    def _inv_columns(self, idx: jnp.ndarray) -> jnp.ndarray:
        """Columns idx of H^{-1}: solve H X = E_idx."""
        E = jnp.zeros((self._D, idx.shape[0]), dtype=self._H.dtype)
        E = E.at[idx, jnp.arange(idx.shape[0])].set(1.0)
        return jax.scipy.linalg.cho_solve(self._chol, E)

    def marginal_covariance(self, key: int) -> jnp.ndarray:
        """Sigma_kk in the tangent space at the linearization point."""
        if self._tree is not None:
            return self._tree.marginal_covariance(key)
        start, d = self._slice(key)
        idx = jnp.arange(start, start + d)
        X = self._inv_columns(idx)
        return X[idx, :]

    def marginal_information(self, key: int) -> jnp.ndarray:
        return jnp.linalg.inv(self.marginal_covariance(key))

    def joint_marginal_covariance(self, keys: Sequence[int]) -> jnp.ndarray:
        """Joint covariance over the concatenated tangents of `keys`
        (reference JointMarginal, Marginals.h:96)."""
        idx_parts = []
        for k in keys:
            start, d = self._slice(k)
            idx_parts.append(np.arange(start, start + d))
        idx = jnp.asarray(np.concatenate(idx_parts))
        X = self._inv_columns(idx)
        return X[idx, :]

    def joint_marginal_information(self, keys: Sequence[int]) -> jnp.ndarray:
        return jnp.linalg.inv(self.joint_marginal_covariance(keys))

    def batch_marginal_covariances(self, keys: Sequence[int]) -> List[jnp.ndarray]:
        """All requested marginals with ONE batched solve (TPU-friendly)."""
        slices = [self._slice(k) for k in keys]
        idx = jnp.asarray(
            np.concatenate([np.arange(s, s + d) for s, d in slices])
        )
        X = np.asarray(self._inv_columns(idx))
        out = []
        col = 0
        for s, d in slices:
            out.append(jnp.asarray(X[s : s + d, col : col + d]))
            col += d
        return out
