"""Linear solvers over a LinearizedGraph.

The reference solves the linearized system by sparse multifrontal elimination
(gtsam/linear/GaussianFactorGraph.cpp:309-323). This module provides the
TPU-native solver family:

  * `gradient` / `hvp`: matrix-free J^T b and (J^T J) v via gather +
    segment-sum scatter — one batched matmul per factor type (MXU) and XLA
    scatter reductions; the analog of GaussianFactorGraph::multiplyHessianAdd.
  * `hessian_block_diagonal`: per-variable D×D blocks (hessianDiagonal) —
    the block-Jacobi preconditioner.
  * `assemble_dense`: scatter-add of block outer products into one dense
    [D, D] Hessian + dense Cholesky — exact solve used for small/medium
    systems and as the reference oracle for the sparse supernodal path.
  * `pcg_solve`: preconditioned CG (the analog of PCGSolver/Preconditioner,
    gtsam/linear/PCGSolver.h) — matrix-free, scales to the largest graphs.

Delta vectors are VectorValues: {type_name: [N_t, dim_t]}.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.nonlinear.factor_graph import LinearizedGraph

VectorValues = Dict[str, jnp.ndarray]


def _tdim(t: str) -> int:
    return manifold.get(t).dim


def zero_delta(lg: LinearizedGraph, dtype) -> VectorValues:
    return {
        t: jnp.zeros((n, _tdim(t)), dtype=dtype) for t, n in lg.type_counts.items()
    }


def gradient(lg: LinearizedGraph) -> VectorValues:
    """g = J^T b (= -J^T r, the negative gradient of 0.5||r||^2)."""
    dtype = lg.batches[0].b.dtype if lg.batches else jnp.float32
    g = zero_delta(lg, dtype)
    for lb in lg.batches:
        for k, t in enumerate(lb.var_types):
            contrib = lb.sign * jnp.einsum("ndk,nd->nk", lb.A[k], lb.b)
            g[t] = g[t].at[jnp.asarray(lb.rows[k])].add(contrib)
    return g


def hvp(lg: LinearizedGraph, v: VectorValues) -> VectorValues:
    """(J^T J) v, matrix-free."""
    out = {t: jnp.zeros_like(x) for t, x in v.items()}
    for lb in lg.batches:
        u = None
        for k, t in enumerate(lb.var_types):
            vk = v[t][jnp.asarray(lb.rows[k])]
            uk = jnp.einsum("ndk,nk->nd", lb.A[k], vk)
            u = uk if u is None else u + uk
        for k, t in enumerate(lb.var_types):
            contrib = lb.sign * jnp.einsum("ndk,nd->nk", lb.A[k], u)
            out[t] = out[t].at[jnp.asarray(lb.rows[k])].add(contrib)
    return out


def hessian_block_diagonal(lg: LinearizedGraph) -> Dict[str, jnp.ndarray]:
    """Per-variable diagonal blocks of J^T J: {t: [N_t, d, d]}."""
    dtype = lg.batches[0].b.dtype if lg.batches else jnp.float32
    out = {
        t: jnp.zeros((n, _tdim(t), _tdim(t)), dtype=dtype)
        for t, n in lg.type_counts.items()
    }
    for lb in lg.batches:
        for k, t in enumerate(lb.var_types):
            blk = lb.sign * jnp.einsum("ndi,ndj->nij", lb.A[k], lb.A[k])
            out[t] = out[t].at[jnp.asarray(lb.rows[k])].add(blk)
    return out


def error(lg: LinearizedGraph, delta: VectorValues) -> jnp.ndarray:
    """0.5 || A delta - b ||^2 (linear model cost at delta)."""
    dtype = lg.batches[0].b.dtype if lg.batches else jnp.float32
    total = jnp.zeros((), dtype=dtype)
    for lb in lg.batches:
        u = -lb.b
        for k, t in enumerate(lb.var_types):
            vk = delta[t][jnp.asarray(lb.rows[k])]
            u = u + jnp.einsum("ndk,nk->nd", lb.A[k], vk)
        total = total + lb.sign * 0.5 * jnp.sum(u * u)
    return total


# --- global offsets ---------------------------------------------------------


def offsets(lg: LinearizedGraph) -> Tuple[Dict[str, int], int]:
    """Global flat offsets per type (variables grouped by type)."""
    off = {}
    d = 0
    for t in sorted(lg.type_counts.keys()):
        off[t] = d
        d += lg.type_counts[t] * _tdim(t)
    return off, d


def flatten_delta(lg: LinearizedGraph, v: VectorValues) -> jnp.ndarray:
    off, d = offsets(lg)
    parts = [v[t].reshape(-1) for t in sorted(lg.type_counts.keys())]
    return jnp.concatenate(parts) if parts else jnp.zeros((0,))


def unflatten_delta(lg: LinearizedGraph, x: jnp.ndarray) -> VectorValues:
    out = {}
    start = 0
    for t in sorted(lg.type_counts.keys()):
        n, dim = lg.type_counts[t], _tdim(t)
        out[t] = x[start : start + n * dim].reshape(n, dim)
        start += n * dim
    return out


# --- dense exact solve --------------------------------------------------------


def assemble_dense(lg: LinearizedGraph):
    """Scatter-add all block outer products into dense (H, g).

    H = J^T J [D, D], g = J^T b [D]. Exact analog of
    HessianFactor Scatter-driven assembly (gtsam/linear/HessianFactor.cpp:515)
    with a single global scatter instead of per-clique ones.
    """
    off, D = offsets(lg)
    dtype = lg.batches[0].b.dtype if lg.batches else jnp.float32
    H = jnp.zeros((D, D), dtype=dtype)
    g = jnp.zeros((D,), dtype=dtype)
    for lb in lg.batches:
        gidx = []
        for k, t in enumerate(lb.var_types):
            dk = _tdim(t)
            base = off[t] + jnp.asarray(lb.rows[k], dtype=jnp.int32) * dk
            gidx.append(base[:, None] + jnp.arange(dk, dtype=jnp.int32)[None, :])
        for k in range(len(lb.var_types)):
            g = g.at[gidx[k]].add(lb.sign * jnp.einsum("ndk,nd->nk", lb.A[k], lb.b))
            for l in range(len(lb.var_types)):
                blk = lb.sign * jnp.einsum("ndi,ndj->nij", lb.A[k], lb.A[l])
                H = H.at[gidx[k][:, :, None], gidx[l][:, None, :]].add(blk)
    return H, g


def dense_solve(
    H: jnp.ndarray,
    g: jnp.ndarray,
    lam: jnp.ndarray | float = 0.0,
    diagonal_damping: bool = False,
):
    """Solve (H + lam * D) delta = g with D = I or diag(H)."""
    D = H.shape[0]
    if diagonal_damping:
        damp = jnp.diag(jnp.diagonal(H))
    else:
        damp = jnp.eye(D, dtype=H.dtype)
    Hd = H + lam * damp
    L, low = jax.scipy.linalg.cho_factor(Hd, lower=True)
    return jax.scipy.linalg.cho_solve((L, low), g)


# --- preconditioned conjugate gradients ---------------------------------------


def _block_inv(blocks: jnp.ndarray, jitter: float = 1e-8) -> jnp.ndarray:
    d = blocks.shape[-1]
    eye = jnp.eye(d, dtype=blocks.dtype)
    return jnp.linalg.solve(blocks + jitter * eye, jnp.broadcast_to(eye, blocks.shape))


def pcg_solve(
    lg: LinearizedGraph,
    lam=0.0,
    diagonal_damping: bool = False,
    tol: float = 1e-10,
    max_iters: int = 500,
) -> VectorValues:
    """Block-Jacobi preconditioned CG on (J^T J + lam*D) delta = J^T b.

    Matrix-free; analog of PCGSolver with BlockJacobiPreconditioner
    (gtsam/linear/PCGSolver.h, Preconditioner.h).
    """
    g = gradient(lg)
    blocks = hessian_block_diagonal(lg)
    if diagonal_damping:
        damp = {t: jax.vmap(jnp.diag)(jax.vmap(jnp.diagonal)(b)) for t, b in blocks.items()}
    else:
        damp = {
            t: jnp.broadcast_to(jnp.eye(b.shape[-1], dtype=b.dtype), b.shape)
            for t, b in blocks.items()
        }
    lam = jnp.asarray(lam)
    pre_blocks = {t: blocks[t] + lam * damp[t] for t in blocks}
    Minv = {t: _block_inv(b) for t, b in pre_blocks.items()}

    def A(v):
        base = hvp(lg, v)
        return {
            t: base[t] + lam * jnp.einsum("nij,nj->ni", damp[t], v[t]) for t in base
        }

    def apply_Minv(r):
        return {t: jnp.einsum("nij,nj->ni", Minv[t], r[t]) for t in r}

    def dot(a, b):
        return sum(jnp.vdot(a[t], b[t]) for t in a)

    x = {t: jnp.zeros_like(v) for t, v in g.items()}
    r = g  # residual = g - A@0
    z = apply_Minv(r)
    p = z
    rz = dot(r, z)
    g_norm2 = dot(g, g)

    def cond(state):
        x, r, p, rz, it = state
        return jnp.logical_and(it < max_iters, dot(r, r) > tol * tol * g_norm2)

    def body(state):
        x, r, p, rz, it = state
        Ap = A(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = {t: x[t] + alpha * p[t] for t in x}
        r = {t: r[t] - alpha * Ap[t] for t in r}
        z = apply_Minv(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = {t: z[t] + beta * p[t] for t in p}
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    return x


def pcg(A, g, Minv, tol: float = 1e-8, max_iters: int = 500):
    """Generic preconditioned CG over VectorValues pytrees.

    A: v -> Av (matrix-free operator), g: right-hand side, Minv: r -> M^-1 r
    (e.g. the spanning-tree exact solve of SubgraphSolver). Returns x with
    A x ~= g. The iterative core of PCGSolver (gtsam/linear/PCGSolver.h)
    with a pluggable Preconditioner."""

    def dot(a, b):
        return sum(jnp.vdot(a[t], b[t]) for t in a)

    x = {t: jnp.zeros_like(v) for t, v in g.items()}
    r = g
    z = Minv(r)
    p = z
    rz = dot(r, z)
    g_norm2 = dot(g, g)
    it = 0
    while it < max_iters and float(dot(r, r)) > tol * tol * float(g_norm2):
        Ap = A(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = {t: x[t] + alpha * p[t] for t in x}
        r = {t: r[t] - alpha * Ap[t] for t in r}
        z = Minv(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = {t: z[t] + beta * p[t] for t in p}
        rz = rz_new
        it += 1
    return x
