"""Exact QR elimination: equality-constrained and rank-deficient solves.

The reference eliminates sigma==0 (Constrained) noise rows with a staggered
host QR: infinite-weight rows act as exact Gaussian-elimination pivots while
finite rows are orthogonalized around them (gtsam/linear/NoiseModel.cpp:503,
gtsam/linear/JacobianFactor.cpp:804-894). That row-at-a-time pivot dance is
hostile to a systolic array, so the TPU-native design solves the SAME problem
— min ||A x - b||^2  subject to  C x = d  — by the nullspace method:

    C^T = Q R   (one full QR on the MXU; Q = [Q1 | Z], Z spans null(C))
    x0  = Q1 R^{-T} d                (minimum-norm particular solution)
    z   = argmin ||A (x0 + Z z) - b||  via  (Z^T H Z + lam*Dz) z = Z^T (g - H x0)
    x   = x0 + Z z

The constraint is satisfied exactly (to factorization roundoff, ~1e-14 in
f64) instead of to 1/mu^2 as in the penalty treatment. All dense linear
algebra is batched XLA (QR + Cholesky), no host loops.

`qr_solve` additionally provides the rank-revealing least-squares solve the
reference reaches through EliminateQR on rank-deficient systems
(JacobianFactor.cpp:804): SVD-based lstsq returning the minimum-norm
solution instead of throwing IndeterminantLinearSystemException.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import LinearizedGraph


def has_constraints(lg: LinearizedGraph) -> bool:
    return any(
        lb.constrained_mask is not None and lb.constrained_mask.any()
        for lb in lg.batches
    )


def assemble_constrained(lg: LinearizedGraph):
    """Split the linearized graph into (H, g) over least-squares rows and a
    dense constraint system (C, d) over sigma==0 rows.

    Constraint row indices are host-planned (masks are host numpy), so the
    assembled C has a static [nc, D] shape and the whole thing jits.
    """
    off, D = linsolve.offsets(lg)
    dtype = lg.batches[0].b.dtype if lg.batches else jnp.float32
    H = jnp.zeros((D, D), dtype=dtype)
    g = jnp.zeros((D,), dtype=dtype)

    # host plan: one global row id per constrained (factor, row) pair
    nc = 0
    plans = []  # per batch: None | [N, d] int32 global constraint row (-1 = LS row)
    for lb in lg.batches:
        if lb.constrained_mask is None or not lb.constrained_mask.any():
            plans.append(None)
            continue
        m = lb.constrained_mask
        rowid = np.full(m.shape, -1, dtype=np.int64)
        rowid[m] = nc + np.arange(int(m.sum()))
        nc += int(m.sum())
        plans.append(rowid)

    C = jnp.zeros((nc, D), dtype=dtype)
    d_vec = jnp.zeros((nc,), dtype=dtype)

    for lb, rowid in zip(lg.batches, plans):
        gidx = []
        for k, t in enumerate(lb.var_types):
            dk = manifold.get(t).dim
            base = off[t] + jnp.asarray(lb.rows[k], dtype=jnp.int32) * dk
            gidx.append(base[:, None] + jnp.arange(dk, dtype=jnp.int32)[None, :])
        if rowid is None:
            A = lb.A
            b = lb.b
        else:
            # zero the constrained rows out of the LS contribution
            keep = jnp.asarray(~lb.constrained_mask, dtype=lb.b.dtype)
            A = tuple(Ak * keep[:, :, None] for Ak in lb.A)
            b = lb.b * keep
            # scatter constrained rows into C, d
            cm = lb.constrained_mask
            fsel, rsel = np.nonzero(cm)
            rows_g = jnp.asarray(rowid[fsel, rsel], dtype=jnp.int32)
            for k in range(len(lb.var_types)):
                C = C.at[rows_g[:, None], gidx[k][fsel]].add(
                    lb.A[k][fsel, rsel, :]
                )
            d_vec = d_vec.at[rows_g].add(lb.b[fsel, rsel])
        for k in range(len(lb.var_types)):
            g = g.at[gidx[k]].add(lb.sign * jnp.einsum("ndk,nd->nk", A[k], b))
            for l in range(len(lb.var_types)):
                blk = lb.sign * jnp.einsum("ndi,ndj->nij", A[k], A[l])
                H = H.at[gidx[k][:, :, None], gidx[l][:, None, :]].add(blk)
    return H, g, C, d_vec


def solve_lse(
    H: jnp.ndarray,
    g: jnp.ndarray,
    C: jnp.ndarray,
    d: jnp.ndarray,
    lam=0.0,
    diagonal_damping: bool = False,
):
    """Damped equality-constrained normal-equation solve (nullspace method).

    Returns (x, lin_decrease) with C x = d exact and x minimizing the damped
    least-squares model on the constraint manifold.
    """
    D = H.shape[0]
    nc = C.shape[0]
    Qf, Rf = jnp.linalg.qr(C.T, mode="complete")  # C^T [D, nc] = Qf [D,D] @ [R;0]
    Z = Qf[:, nc:]
    # particular solution via masked pseudo-inverse: redundant equality
    # constraints (e.g. two NonlinearEquality factors on the same key) make
    # the triangular factor singular; the SVD pinv stays finite and picks
    # the minimum-norm feasible point. Note dependent rows conservatively
    # SHRINK the optimized subspace Z (still feasible, slightly restricted);
    # the reference's staggered constrained QR tolerates them the same way
    # by treating dependent rows as zero pivots (NoiseModel.cpp:503).
    U_, S_, Vt_ = jnp.linalg.svd(C, full_matrices=False)
    tol = jnp.finfo(H.dtype).eps * max(D, nc) * 10.0
    Sinv = jnp.where(S_ > tol * jnp.max(S_), 1.0 / jnp.maximum(S_, tol), 0.0)
    x0 = Vt_.T @ (Sinv * (U_.T @ d))
    if diagonal_damping:
        damp = jnp.diag(jnp.diagonal(H))
    else:
        damp = jnp.eye(D, dtype=H.dtype)
    Hd = H + lam * damp
    Hz = Z.T @ Hd @ Z
    gz = Z.T @ (g - H @ x0)
    L, low = jax.scipy.linalg.cho_factor(
        Hz + 1e-12 * jnp.eye(Hz.shape[0], dtype=H.dtype), lower=True
    )
    z = jax.scipy.linalg.cho_solve((L, low), gz)
    x = x0 + Z @ z
    lin_dec = jnp.dot(g, x) - 0.5 * jnp.dot(x, H @ x)
    return x, lin_dec


def solve_constrained_dense(
    lg: LinearizedGraph, lam=0.0, diagonal_damping: bool = False
):
    """Full pipeline: assemble + LSE solve -> (VectorValues delta, lin_dec)."""
    H, g, C, d = assemble_constrained(lg)
    x, lin_dec = solve_lse(H, g, C, d, lam, diagonal_damping)
    return linsolve.unflatten_delta(lg, x), lin_dec


def qr_solve(A: jnp.ndarray, b: jnp.ndarray, rcond: Optional[float] = None):
    """Rank-revealing least-squares min ||A x - b|| (EliminateQR analog).

    Full-rank systems: thin QR + triangular solve (MXU-friendly).
    Rank-deficient systems are the reason the reference uses QR over
    Cholesky (JacobianFactor.cpp:804): here lstsq (SVD) returns the
    minimum-norm solution instead of throwing.
    """
    return jnp.linalg.lstsq(A, b, rcond=rcond)[0]
