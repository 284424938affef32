"""Batched block partial-Cholesky kernels (the device hot loop).

This is the TPU-native re-design of the reference's per-clique dense kernel
`choleskyPartial` (gtsam/base/cholesky.cpp:106-159: LLT of the frontal block,
triangular solve of the separator coupling, SYRK downdate). Instead of one
dynamic-shape dense factorization per clique, a whole shape-bucket of cliques
[B, m, m] is factored by ONE `lax.fori_loop` over block columns whose body is
a handful of full-width batched matmuls (MXU) — no data-dependent shapes, no
XLA `cholesky`/`triangular_solve` custom calls (which compile slowly and run
scalar-bound at these sizes on TPU).

Numerical-failure surfacing (the IndeterminantLinearSystemException /
choleskyCareful analog, gtsam/base/cholesky.cpp:30-73): non-positive pivots
are clamped to a tiny value and COUNTED; callers receive the bad-pivot count
per solve so LM can distinguish "indefinite at this lambda" from success.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# f32 matmuls on TPU default to bf16 passes; Cholesky needs full f32
_einsum = partial(jnp.einsum, precision=lax.Precision.HIGHEST)


def _chol_block(D, eps):
    """Unrolled dense Cholesky of one [B, d, d] SPD block.

    Returns (L lower [B, d, d], Linv [B, d, d], bad pivot count [B]).
    Pivots <= eps are clamped (choleskyCareful semantics) and counted.

    Op-count matters more than flops here (the elimination sweep is
    HLO-overhead-bound on TPU): the column loop uses constant select masks,
    and the triangular inverse is a Newton iteration X <- X(2I - M X) that
    is EXACT after ceil(log2(d)) steps for unit-lower-triangular M (the
    error contracts as E -> E^2 and E0 = N^2 is nilpotent of index <= d).
    """
    B, d, _ = D.shape
    dtype = D.dtype
    idx = np.arange(d)
    eye = jnp.eye(d, dtype=dtype)
    cols = []
    pivs = []
    bad = jnp.zeros((B,), dtype=jnp.int32)
    W = D
    for j in range(d):
        colW = W[:, :, j]  # [B, d]
        pivot = colW[:, j]
        bad = bad + (pivot <= eps).astype(jnp.int32)
        piv = jnp.sqrt(jnp.maximum(pivot, eps))
        gtj = jnp.asarray(idx > j)
        ej = jnp.asarray((idx == j).astype(np.float32), dtype=dtype)
        col = jnp.where(gtj, colW / piv[:, None], ej * piv[:, None])
        cols.append(col)
        pivs.append(piv)
        W = W - col[:, :, None] * col[:, None, :]
    L = jnp.stack(cols, axis=2)  # [B, d, d] lower triangular
    piv = jnp.stack(pivs, axis=1)  # [B, d] diagonal of L

    # Linv via Newton on the unit-lower factor: L = Lc diag(piv) with
    # Lc = L / piv (columns), so L^-1 = diag(1/piv) Lc^-1... careful:
    # L = Lc * piv[col] => L^-1 = diag-col-inv: X such that X L = I.
    inv_piv = 1.0 / piv
    Lc = L * inv_piv[:, None, :]  # unit lower triangular
    X = 2.0 * eye - Lc
    n_steps = max(0, int(np.ceil(np.log2(d))) - 1)
    for _ in range(n_steps):
        X = _einsum("bij,bjk->bik", X, 2.0 * eye - _einsum("bij,bjk->bik", Lc, X))
    Linv = X * inv_piv[:, :, None]  # rows scaled: (Lc D)^-1 = D^-1 Lc^-1
    return L, Linv, bad


def partial_cholesky(Fm, gm, nf: int, d: int, eps=1e-10):
    """Partial block Cholesky of a clique bucket.

    Fm: [B, m, m] symmetric frontal matrices (m = (nf + ns_blocks) * d),
    gm: [B, m] right-hand sides. The first fd = nf*d rows/cols are frontal.

    Returns dict with:
      L    [B, fd, fd]  lower Cholesky factor of F11
      Linv [B, nf, d, d] inverses of L's diagonal blocks (for back-subst)
      W    [B, fd, sd]  = L^-1 F12
      y    [B, fd]      = L^-1 g1
      U    [B, sd, sd]  Schur downdate  F22 - W^T W
      ug   [B, sd]      g2 - W^T y
      bad  []           int32 count of clamped pivots in this bucket

    Matches choleskyPartial (base/cholesky.cpp:106): U/ug are the separator
    contribution passed up the tree (ClusterTree-inst.h:219 extend-add).
    """
    B, m, _ = Fm.shape
    fd = nf * d
    sd = m - fd
    dtype = Fm.dtype
    eps = jnp.asarray(eps, dtype=dtype)

    F11 = Fm[:, :fd, :fd]
    # RHS carries [F12 | g1]: forward-substituted in-loop so W and y pop out
    R0 = jnp.concatenate([Fm[:, :fd, fd:], gm[:, :fd, None]], axis=2)
    L0 = jnp.zeros((B, fd, fd), dtype=dtype)
    Linv0 = jnp.zeros((B, nf, d, d), dtype=dtype)
    row_ids = lax.broadcasted_iota(jnp.int32, (1, fd, 1), 1)

    def body(j, carry):
        F, L, Linv, R, bad = carry
        jd = j * d
        Dj = lax.dynamic_slice(F, (0, jd, jd), (B, d, d))
        Lj, Linv_j, badj = _chol_block(Dj, eps)
        # panel below the diagonal block: L[i>j, j] = F[i, j] Linv_j^T
        panel = lax.dynamic_slice(F, (0, 0, jd), (B, fd, d))
        P = _einsum("bfk,bjk->bfj", panel, Linv_j)
        P = jnp.where(row_ids >= (jd + d), P, 0.0)
        Pfull = lax.dynamic_update_slice(P, Lj, (0, jd, 0))
        L = lax.dynamic_update_slice(L, Pfull, (0, 0, jd))
        Linv = lax.dynamic_update_slice(Linv, Linv_j[:, None], (0, j, 0, 0))
        # forward substitution on [F12 | g1]
        Rj = lax.dynamic_slice(R, (0, jd, 0), (B, d, sd + 1))
        yj = _einsum("bij,bjr->bir", Linv_j, Rj)
        R = lax.dynamic_update_slice(R, yj, (0, jd, 0))
        R = R - _einsum("bfj,bjr->bfr", P, yj)
        # SYRK trailing update (P zero on factored rows -> only trailing hit)
        F = F - _einsum("bfj,bgj->bfg", P, P)
        return F, L, Linv, R, bad + jnp.sum(badj).astype(jnp.int32)

    init = (F11, L0, Linv0, R0, jnp.zeros((), jnp.int32))
    if nf <= 2:
        # unrolled: cheaper than a loop for 1-2 iterations
        carry = init
        for j in range(nf):
            carry = body(j, carry)
        _, L, Linv, R, bad = carry
    else:
        _, L, Linv, R, bad = lax.fori_loop(0, nf, body, init)

    W = R[:, :, :sd]
    y = R[:, :, sd]
    if sd > 0:
        U = Fm[:, fd:, fd:] - _einsum("bkf,bkg->bfg", W, W)
        ug = gm[:, fd:] - _einsum("bkf,bk->bf", W, y)
    else:
        U = jnp.zeros((B, 0, 0), dtype=dtype)
        ug = jnp.zeros((B, 0), dtype=dtype)
    return dict(L=L, Linv=Linv, W=W, y=y, U=U, ug=ug, bad=bad)


def forward_solve_bucket(L, Linv, rhs, nf: int, d: int):
    """Solve L y = rhs (forward block substitution). L [B, fd, fd] lower,
    rhs [B, fd] -> y [B, fd]."""
    B, fdim, _ = L.shape

    def body(j, y):
        jd = j * d
        rj = lax.dynamic_slice(rhs, (0, jd), (B, d))
        # subtract contributions of already-solved block rows: L's block
        # row j against y (cols < jd solved, cols >= jd still zero in y)
        Lrow = lax.dynamic_slice(L, (0, jd, 0), (B, d, fdim))
        rj = rj - _einsum("bkf,bf->bk", Lrow, y)
        Linv_j = lax.dynamic_slice(Linv, (0, j, 0, 0), (B, 1, d, d))[:, 0]
        yj = _einsum("bjk,bk->bj", Linv_j, rj)
        return lax.dynamic_update_slice(y, yj, (0, jd))

    y0 = jnp.zeros_like(rhs)
    if nf <= 2:
        y = y0
        for j in range(nf):
            y = body(j, y)
        return y
    return lax.fori_loop(0, nf, body, y0)


def tri_lower_inv(L, Linv, nf: int, d: int):
    """Full inverse of the lower-triangular L [B, fd, fd] by blocked forward
    substitution (Linv are the diagonal-block inverses). Used by the
    Bayes-tree marginal sweep (Sigma_FF needs L^{-T} L^{-1})."""
    B, fd, _ = L.shape
    eye_d = jnp.eye(d, dtype=L.dtype)

    def body(i, Z):
        idd = i * d
        Lrow = lax.dynamic_slice(L, (0, idd, 0), (B, d, fd))
        # rhs_i = e_i - sum_{k<i} L[i,k] Z[k] (Z rows >= idd still zero)
        Ei = -_einsum("bkf,bfg->bkg", Lrow, Z)
        diag = lax.dynamic_slice(Ei, (0, 0, idd), (B, d, d)) + eye_d
        Ei = lax.dynamic_update_slice(Ei, diag, (0, 0, idd))
        Linv_i = lax.dynamic_slice(Linv, (0, i, 0, 0), (B, 1, d, d))[:, 0]
        Zi = _einsum("bij,bjf->bif", Linv_i, Ei)
        return lax.dynamic_update_slice(Z, Zi, (0, idd, 0))

    Z0 = jnp.zeros_like(L)
    if nf <= 2:
        Z = Z0
        for i in range(nf):
            Z = body(i, Z)
        return Z
    return lax.fori_loop(0, nf, body, Z0)


def backsolve_bucket(L, Linv, rhs, nf: int, d: int):
    """Solve L^T x = rhs for one bucket. L [B, fd, fd] lower (from
    partial_cholesky), Linv its diagonal-block inverses [B, nf, d, d],
    rhs [B, fd]. Mirrors GaussianConditional::solve back-substitution
    (gtsam/linear/GaussianConditional.cpp:218)."""
    B, fdim, _ = L.shape

    def body(jj, x):
        j = nf - 1 - jj
        jd = j * d
        Lcol = lax.dynamic_slice(L, (0, 0, jd), (B, fdim, d))
        rj = lax.dynamic_slice(rhs, (0, jd), (B, d))
        # subtract already-solved entries: rows below (strictly lower) only;
        # x rows in the diagonal block are still zero so no masking needed
        rj = rj - _einsum("bfk,bf->bk", Lcol, x)
        Linv_j = lax.dynamic_slice(Linv, (0, j, 0, 0), (B, 1, d, d))[:, 0]
        xj = _einsum("bkj,bk->bj", Linv_j, rj)  # Linv_j^T rj
        return lax.dynamic_update_slice(x, xj, (0, jd))

    x0 = jnp.zeros_like(rhs)
    if nf <= 2:
        x = x0
        for jj in range(nf):
            x = body(jj, x)
        return x
    return lax.fori_loop(0, nf, body, x0)
