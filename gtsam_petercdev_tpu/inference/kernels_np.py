"""Eager numpy twins of the batched partial-Cholesky kernels.

The incremental engine's per-update problems are SMALL (a few cliques of a
few dozen rows in the odometry steady state; a few hundred in a loop-closure
cascade). At that scale the jitted path is bound by per-shape-signature
compilation (each new (nf, ns, B) class costs an XLA compile) and per-call
dispatch, not flops — a City10000 run spends minutes compiling and the
closure cascades generate fresh signatures throughout. These eager BLAS
twins execute the SAME math (gtsam/base/cholesky.cpp:106-159 semantics,
clamped-and-counted pivots) with zero compilation; the engine selects them
via backend="numpy" (the default on CPU hosts).

Implementation notes: np.einsum costs ~45us per call in setup alone, so the
hot loops use np.matmul / broadcasting, and the triangular block inverse is
the same Newton iteration as the jitted kernel (exact after ceil(log2 d)
steps for unit-triangular factors).
"""

from __future__ import annotations

import numpy as np


def _chol_block(D, eps):
    """Batched dense Cholesky of [B, d, d] SPD blocks with clamped pivots.

    Returns (L, Linv, bad_count). Mirrors kernels._chol_block.
    """
    B, d, _ = D.shape
    W = D.copy()
    L = np.zeros_like(D)
    bad = 0
    pivs = np.empty((B, d), dtype=D.dtype)
    for j in range(d):
        pivot = W[:, j, j]
        bad += int((pivot <= eps).sum())
        piv = np.sqrt(np.maximum(pivot, eps))
        col = W[:, :, j] / piv[:, None]
        col[:, :j] = 0.0
        col[:, j] = piv
        L[:, :, j] = col
        pivs[:, j] = piv
        W -= col[:, :, None] * col[:, None, :]
    # Newton triangular inverse: Lc = L diag(1/piv) is unit lower; X0 = 2I-Lc
    # has error N^2 (N = Lc - I nilpotent), squaring per step -> exact after
    # ceil(log2 d) - 1 further steps.
    eye = np.eye(d, dtype=D.dtype)
    Lc = L / pivs[:, None, :]
    X = 2.0 * eye - Lc
    for _ in range(max(0, int(np.ceil(np.log2(d))) - 1)):
        X = np.matmul(X, 2.0 * eye - np.matmul(Lc, X))
    Linv = X / pivs[:, :, None]
    return L, Linv, bad


def _native_lib():
    global _NATIVE
    if _NATIVE is _UNSET:
        from gtsam_petercdev_tpu.native.build import load_solve_library

        _NATIVE = load_solve_library()
    return _NATIVE


_UNSET = object()
_NATIVE = _UNSET


def partial_cholesky(Fm, gm, nf: int, d: int, eps=1e-10):
    """Eager twin of kernels.partial_cholesky: [B, m, m] bucket -> dict with
    L, Linv, W, y, U, ug, bad (same layouts).

    Dispatch: small/medium buckets go through the native scalar kernel
    (native/src/solve_native.cpp chol_bucket — per-call dispatch overhead
    of numpy/scipy dominates at m <= ~128); very large frontals use one
    LAPACK dpotrf + dtrsm per clique; the numpy clamped-pivot loop is the
    always-correct fallback."""
    B, m, _ = Fm.shape
    if m <= 384 and Fm.dtype == np.float64:
        lib = _native_lib()
        if lib is not None:
            return _partial_cholesky_native(lib, Fm, gm, nf, d, eps)
    if nf * d >= 48 and B <= 8:
        try:
            return _partial_cholesky_lapack(Fm, gm, nf, d)
        except Exception:
            pass  # indefinite: clamped-pivot loop below
    return _partial_cholesky_loop(Fm, gm, nf, d, eps)


def _partial_cholesky_native(lib, Fm, gm, nf, d, eps):
    import ctypes

    B, m, _ = Fm.shape
    fd = nf * d
    sd = m - fd
    Fm = np.ascontiguousarray(Fm)
    gm = np.ascontiguousarray(gm)
    L = np.empty((B, fd, fd))
    Linv = np.empty((B, nf, d, d))
    W = np.empty((B, fd, sd))
    y = np.empty((B, fd))
    U = np.empty((B, sd, sd))
    ug = np.empty((B, sd))
    work = np.empty(m * m + m)
    c = lambda a: ctypes.c_void_p(a.ctypes.data)
    bad = lib.chol_bucket(
        c(Fm), c(gm), B, m, nf, d, float(eps),
        c(L), c(Linv), c(W), c(y), c(U), c(ug), c(work),
    )
    return dict(L=L, Linv=Linv, W=W, y=y, U=U, ug=ug, bad=int(bad))


def _partial_cholesky_lapack(Fm, gm, nf: int, d: int):
    import scipy.linalg as sla

    B, m, _ = Fm.shape
    fd = nf * d
    sd = m - fd
    L = np.zeros((B, fd, fd), dtype=Fm.dtype)
    Linv = np.zeros((B, nf, d, d), dtype=Fm.dtype)
    W = np.zeros((B, fd, sd), dtype=Fm.dtype)
    y = np.zeros((B, fd), dtype=Fm.dtype)
    U = np.zeros((B, sd, sd), dtype=Fm.dtype)
    ug = np.zeros((B, sd), dtype=Fm.dtype)
    for b in range(B):
        Lb = sla.cholesky(Fm[b, :fd, :fd], lower=True, check_finite=False)
        R = np.concatenate([Fm[b, :fd, fd:], gm[b, :fd, None]], axis=1)
        Rb = sla.solve_triangular(Lb, R, lower=True, check_finite=False)
        L[b] = Lb
        W[b] = Rb[:, :sd]
        y[b] = Rb[:, sd]
        if sd:
            U[b] = Fm[b, fd:, fd:] - Rb[:, :sd].T @ Rb[:, :sd]
            ug[b] = gm[b, fd:] - Rb[:, :sd].T @ Rb[:, sd]
        # diagonal d-block inverses (batched) for the wildfire backsolve
        idx = np.arange(nf)
        diag_blocks = Lb.reshape(nf, d, nf, d)[idx, :, idx, :]
        Linv[b] = np.linalg.inv(diag_blocks)
    return dict(L=L, Linv=Linv, W=W, y=y, U=U, ug=ug, bad=0)


def _partial_cholesky_loop(Fm, gm, nf: int, d: int, eps):
    B, m, _ = Fm.shape
    fd = nf * d
    sd = m - fd
    F = np.ascontiguousarray(Fm[:, :fd, :fd])
    L = np.zeros((B, fd, fd), dtype=Fm.dtype)
    Linv = np.zeros((B, nf, d, d), dtype=Fm.dtype)
    R = np.concatenate([Fm[:, :fd, fd:], gm[:, :fd, None]], axis=2)
    bad = 0
    for j in range(nf):
        jd = j * d
        Lj, Linv_j, badj = _chol_block(F[:, jd : jd + d, jd : jd + d], eps)
        bad += badj
        # P = F[:, :, j-block] @ Linv_j^T, strictly-below rows only
        P = np.matmul(F[:, :, jd : jd + d], Linv_j.transpose(0, 2, 1))
        P[:, : jd + d, :] = 0.0
        L[:, :, jd : jd + d] = P
        L[:, jd : jd + d, jd : jd + d] = Lj
        Linv[:, j] = Linv_j
        yj = np.matmul(Linv_j, R[:, jd : jd + d, :])
        R[:, jd : jd + d, :] = yj
        R -= np.matmul(P, yj)
        F -= np.matmul(P, P.transpose(0, 2, 1))
    W = R[:, :, :sd]
    y = R[:, :, sd]
    if sd > 0:
        Wt = W.transpose(0, 2, 1)
        U = Fm[:, fd:, fd:] - np.matmul(Wt, W)
        ug = gm[:, fd:] - np.matmul(Wt, y[:, :, None])[:, :, 0]
    else:
        U = np.zeros((B, 0, 0), dtype=Fm.dtype)
        ug = np.zeros((B, 0), dtype=Fm.dtype)
    return dict(L=L, Linv=Linv, W=W, y=y, U=U, ug=ug, bad=bad)


def backsolve_bucket(L, Linv, rhs, nf: int, d: int):
    """Solve L^T x = rhs per bucket (eager twin of kernels.backsolve_bucket)."""
    x = np.zeros_like(rhs)
    for jj in range(nf):
        j = nf - 1 - jj
        jd = j * d
        rj = rhs[:, jd : jd + d] - np.matmul(
            L[:, :, jd : jd + d].transpose(0, 2, 1), x[:, :, None]
        )[:, :, 0]
        x[:, jd : jd + d] = np.matmul(
            Linv[:, j].transpose(0, 2, 1), rj[:, :, None]
        )[:, :, 0]
    return x
