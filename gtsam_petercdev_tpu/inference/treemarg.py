"""Bayes-tree marginal covariances: top-down level-batched sweep.

Reference: gtsam/inference/BayesTreeCliqueBase.h:172-203 (cached P(S|R)
shortcut marginals) + nonlinear/Marginals.h:37-128. The reference answers
each query by a lazy recursive shortcut to the root. The TPU-native design
inverts that: ONE top-down sweep computes the joint covariance of every
clique's (frontal ∪ separator) scope, batched per (depth level, shape class)
exactly like the elimination sweep — so all per-variable marginals come out
of a handful of batched device calls instead of per-query recursions.

Recursion (standard Bayes-tree covariance propagation): with the clique's
cached partial Cholesky L = chol(H_FF), W = L^{-1} H_FS and the parent's
Sigma_SS (separator joint covariance, already computed because parents are
swept first):

    X        = L^{-T} W                  (= H_FF^{-1} H_FS)
    Sigma_FF = L^{-T} L^{-1} + X Sigma_SS X^T
    Sigma_FS = -X Sigma_SS

Joint blocks are stored in a FLAT [Gcap, d, d] block pool (same layout trick
as the elimination scratch) so a child can gather its Sigma_SS from a parent
of ANY shape class with one flat gather.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.inference import kernels
from gtsam_petercdev_tpu.inference.incremental import (
    IncrementalEngine,
    _b_class,
    _B_CHUNK,
    _pad,
)


@lru_cache(maxsize=None)
def _marg_level_jit(B, nf, ns, d, pool_cap, Gcap):
    """Process one chunk of same-class cliques: gather parent Sigma_SS from
    the flat store, propagate, scatter this clique's joint back."""

    mb = nf + ns

    def f(G, L, Linv, W, rows, gather_idx, scatter_idx):
        Lg, Linvg, Wg = L[rows], Linv[rows], W[rows]
        Lfi = kernels.tri_lower_inv(Lg, Linvg, nf, d)  # [B, fd, fd]
        Ainv = kernels._einsum("bkf,bkg->bfg", Lfi, Lfi)
        if ns > 0:
            Sblk = G[gather_idx]  # [B, ns, ns, d, d]
            Sss = Sblk.transpose(0, 1, 3, 2, 4).reshape(B, ns * d, ns * d)
            X = kernels._einsum("bkf,bks->bfs", Lfi, Wg)  # [B, fd, sd]
            XS = kernels._einsum("bfs,bst->bft", X, Sss)
            Sff = Ainv + kernels._einsum("bft,bgt->bfg", XS, X)
            Sfs = -XS
            top = jnp.concatenate([Sff, Sfs], axis=2)
            bot = jnp.concatenate([Sfs.transpose(0, 2, 1), Sss], axis=2)
            J = jnp.concatenate([top, bot], axis=1)  # [B, mb*d, mb*d]
        else:
            J = Ainv
        Jb = (
            J.reshape(B, mb, d, mb, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B * mb * mb, d, d)
        )
        G = G.at[scatter_idx.reshape(-1)].set(Jb)
        return G

    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _marg_level_stacked_jit(B, nf, ns, d, Gcap):
    """As _marg_level_jit, but over already-stacked clique payloads (the
    numpy engine backend stores per-clique arrays, not pools)."""
    base = _marg_level_jit(B, nf, ns, d, 0, Gcap)

    def f(G, Lg, Linvg, Wg, gather_idx, scatter_idx):
        rows = jnp.arange(B, dtype=jnp.int32)
        return base(G, Lg, Linvg, Wg, rows, gather_idx, scatter_idx)

    return f


@lru_cache(maxsize=None)
def _zeros_jit(Gcap, d, dtype_str):
    def f(probe):
        return jnp.zeros((Gcap + 1, d, d), dtype=probe.dtype)

    return jax.jit(f)


def _gcap_class(x: int) -> int:
    return max(1024, _pad(x))


class TreeMarginals:
    """All-variable marginal covariances over an IncrementalEngine's tree."""

    def __init__(self, engine: IncrementalEngine):
        self.engine = engine
        d = engine.d
        live = [
            c for c in engine.cliques if c is not None and c.alive
        ]
        # depth via parent chains (roots first)
        depth: Dict[int, int] = {}

        def _depth(c):
            dep = 0
            cid = c.cid
            chain = []
            while cid >= 0 and cid not in depth:
                chain.append(cid)
                cid = engine.cliques[cid].parent
            base = depth[cid] + 1 if cid >= 0 else 0
            for i, x in enumerate(reversed(chain)):
                depth[x] = base + i
            return depth[c.cid]

        for c in live:
            _depth(c)

        # flat block-store layout
        base: Dict[int, int] = {}
        off = 0
        for c in live:
            mb = c.cls[0] + c.cls[1]
            base[c.cid] = off
            off += mb * mb
        self._base = base
        self._Gcap = _gcap_class(off)
        probe = jnp.zeros((), dtype=engine.dtype)
        G = _zeros_jit(self._Gcap, d, str(engine.dtype))(probe)

        # sweep top-down: group by (depth, class), chunk <= _B_CHUNK
        by_dc: Dict[Tuple[int, Tuple[int, int]], List] = {}
        for c in live:
            by_dc.setdefault((depth[c.cid], c.cls), []).append(c)
        for (dep, cls), group in sorted(by_dc.items(), key=lambda kv: kv[0][0]):
            nf, ns = cls
            pc = None if engine._np else engine.pools[cls]
            for s in range(0, len(group), _B_CHUNK):
                chunk = group[s : s + _B_CHUNK]
                B = len(chunk) if engine._np else _b_class(len(chunk))
                rows = np.full(B, 0 if engine._np else pc.cap, dtype=np.int32)
                gather = np.full((B, ns, ns), self._Gcap, dtype=np.int32)
                scatter = np.full(
                    (B, nf + ns, nf + ns), self._Gcap, dtype=np.int32
                )
                for i, c in enumerate(chunk):
                    rows[i] = c.row
                    mb = nf + ns
                    bi = base[c.cid]
                    idx = np.arange(mb)
                    scatter[i, :, :] = bi + idx[:, None] * mb + idx[None, :]
                    if c.parent >= 0 and c.separator:
                        p = engine.cliques[c.parent]
                        mb_p = p.cls[0] + p.cls[1]
                        fpos = {v: j for j, v in enumerate(p.frontal)}
                        spos = {v: j for j, v in enumerate(p.separator)}
                        ppos = np.asarray(
                            [
                                fpos[v]
                                if v in fpos
                                else p.cls[0] + spos[v]
                                for v in c.separator
                            ],
                            dtype=np.int64,
                        )
                        nr = len(c.separator)
                        bp = base[p.cid]
                        gather[i, :nr, :nr] = (
                            bp + ppos[:, None] * mb_p + ppos[None, :]
                        )
                if engine._np:
                    pays = [engine.payloads[c.cid] for c in chunk]
                    fn = _marg_level_stacked_jit(B, nf, ns, d, self._Gcap)
                    G = fn(
                        G,
                        jnp.asarray(np.stack([p.L for p in pays])),
                        jnp.asarray(np.stack([p.Linv for p in pays])),
                        jnp.asarray(np.stack([p.W for p in pays])),
                        jnp.asarray(gather),
                        jnp.asarray(scatter),
                    )
                else:
                    fn = _marg_level_jit(B, nf, ns, d, pc.cap, self._Gcap)
                    G = fn(
                        G,
                        pc.arrays.L,
                        pc.arrays.Linv,
                        pc.arrays.W,
                        jnp.asarray(rows),
                        jnp.asarray(gather),
                        jnp.asarray(scatter),
                    )
        self._G = G

    def covariance_gid(self, gid: int) -> jnp.ndarray:
        """[d, d] tangent-space marginal covariance of one variable (padded
        dims included; callers slice to the manifold dim)."""
        eng = self.engine
        cid = eng.var_clique[gid]
        c = eng.cliques[cid]
        pos = c.frontal.index(gid)
        mb = c.cls[0] + c.cls[1]
        return self._G[self._base[cid] + pos * mb + pos]

    def joint_gids(self, gids: List[int]) -> Optional[jnp.ndarray]:
        """Joint covariance if all gids share one clique scope, else None
        (cross-clique joints fall back to the dense path)."""
        eng = self.engine
        cid = eng.var_clique.get(gids[0])
        if cid is None:
            return None
        c = eng.cliques[cid]
        fpos = {v: j for j, v in enumerate(c.frontal)}
        spos = {v: j for j, v in enumerate(c.separator)}
        pos = []
        for g in gids:
            if g in fpos:
                pos.append(fpos[g])
            elif g in spos:
                pos.append(c.cls[0] + spos[g])
            else:
                return None
        mb = c.cls[0] + c.cls[1]
        pos = np.asarray(pos, dtype=np.int64)
        idx = self._base[cid] + pos[:, None] * mb + pos[None, :]
        blocks = self._G[jnp.asarray(idx)]  # [k, k, d, d]
        k = len(gids)
        d = self.engine.d
        return blocks.transpose(0, 2, 1, 3).reshape(k * d, k * d)
