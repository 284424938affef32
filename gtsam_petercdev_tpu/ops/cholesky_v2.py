"""Pallas TPU kernel v2: whole-BUCKET fused partial Cholesky.

The v1 kernel (ops/cholesky.py) runs one grid program per clique, which
serializes the batch axis that the XLA fori_loop path processes as one
vectorized op — measured SLOWER end-to-end (PROFILE_r04.md). v2 keeps the
clique batch INSIDE one Mosaic program: all bucket arrays live in VMEM,
the block-column loop is unrolled with static slices, and every step is a
batched op over [B, ...] — the same math as kernels.partial_cholesky with
the ~30 dependent HLO dispatches per column fused away.

On-chip lowering (round 5): the r4 "HTTP 500, no diagnostics" was three
distinct Mosaic `Not implemented` holes, not an environment problem:
  1. tpu.matmul rejects matvec einsums whose lhs contracting dim is not
     last ("bkf,bk->bf") — rewritten as canonical [B,1,k]x[B,k,f].
  2. vector.multi_reduction to a 1-D result ("Offset change") — the
     pivot/bad reductions now stay 2-D ([B,1]) and the scalar `bad`
     reduction happens outside the kernel.
  3. tpu.concatenate of lane-offset slices ("offset mismatch on
     non-concat dimension") — pivots are accumulated with masked adds
     instead of concatenating [B, j:j+1] slices.
Large buckets stream through a batch-axis grid: chunks of `_chunk_for`
cliques (multiple of 8, sized to a ~6 MB VMEM working set) per Mosaic
program; padded grid rows get masked out of the `bad` count.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_dot = partial(jnp.einsum, precision=lax.Precision.HIGHEST)


def _chol_block_batched(Dj, eps, d):
    """[B, d, d] SPD blocks -> (L, Linv, bad) with clamped pivots.
    Value-based, static ops only (mirrors kernels._chol_block)."""
    B = Dj.shape[0]
    dtype = Dj.dtype
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)  # [1, d]
    ri = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    eye = jnp.where(ri == ci, jnp.ones((d, d), dtype), jnp.zeros((d, d), dtype))
    W = Dj
    cols = []
    bad = jnp.zeros((B, 1), jnp.float32)  # per-batch counts; reduced outside
    piv_acc = jnp.zeros((B, d), dtype)
    for j in range(d):
        colW = W[:, :, j]
        ej = (idx == j).astype(dtype)
        # pivot extraction as a canonical [B,1,d]x[B,d,1] matvec: lane-offset
        # slices (colW[:, j:j+1]) and row reductions both hit Mosaic layout
        # holes ("Offset change"), the MXU form lowers everywhere
        ejc = jnp.broadcast_to(ej.reshape(1, d, 1), (B, d, 1))
        pivot = _dot("brk,bkc->brc", colW[:, None, :], ejc)[:, :, 0]  # [B,1]
        bad = bad + (pivot <= eps).astype(jnp.float32)
        piv = jnp.sqrt(jnp.maximum(pivot, eps))
        gtj = idx > j
        col = jnp.where(gtj, colW / piv, ej * piv)
        cols.append(col)
        piv_acc = piv_acc + piv * ej
        W = W - col[:, :, None] * col[:, None, :]
    L = jnp.stack(cols, axis=2)
    inv_piv = 1.0 / piv_acc
    Lc = L * inv_piv[:, None, :]
    X = 2.0 * eye - Lc
    for _ in range(max(0, int(np.ceil(np.log2(d))) - 1)):
        X = _dot("bij,bjk->bik", X, 2.0 * eye - _dot("bij,bjk->bik", Lc, X))
    Linv = X * inv_piv[:, :, None]
    return L, Linv, bad


def _kernel(B, B_real, Bc, nf, sd, d, eps, F_ref, g_ref, L_ref, Linv_ref,
            W_ref, y_ref, U_ref, ug_ref, bad_ref):
    """B: clique rows in this program's block; B_real: true bucket size
    (rows past it are grid padding — their bad counts are masked); Bc:
    chunk stride of the batch grid."""
    fd = nf * d
    dtype = F_ref.dtype
    Fall = F_ref[...]
    gall = g_ref[...]
    F = Fall[:, :fd, :fd]
    B_ = Fall.shape[0]
    g1 = gall[:, :fd].reshape(B_, fd, 1)
    if sd > 0:
        R = jnp.concatenate([Fall[:, :fd, fd:], g1], axis=2)
    else:
        R = g1
    L = jnp.zeros((B, fd, fd), dtype=dtype)
    bad = jnp.zeros((B_, 1), jnp.float32)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, fd, 1), 1)
    Linvs = []
    for j in range(nf):
        jd = j * d
        Lj, Linv_j, badj = _chol_block_batched(
            F[:, jd : jd + d, jd : jd + d], eps, d
        )
        bad = bad + badj
        panel = F[:, :, jd : jd + d]
        P = _dot("bfk,bjk->bfj", panel, Linv_j)
        P = jnp.where(row_ids >= (jd + d), P, 0.0)
        Pfull = jnp.pad(P, ((0, 0), (0, 0), (jd, fd - jd - d)))
        diag_pad = jnp.pad(Lj, ((0, 0), (jd, fd - jd - d), (jd, fd - jd - d)))
        L = L + Pfull + diag_pad
        Linvs.append(Linv_j)
        Rj = R[:, jd : jd + d, :]
        yj = _dot("bij,bjr->bir", Linv_j, Rj)
        band = jnp.logical_and(row_ids >= jd, row_ids < jd + d)
        yj_pad = jnp.pad(yj, ((0, 0), (jd, fd - jd - d), (0, 0)))
        R = jnp.where(band, yj_pad, R)
        R = R - _dot("bfj,bjr->bfr", P, yj)
        F = F - _dot("bfj,bgj->bfg", P, P)
    W = R[:, :, :sd]
    y = R[:, :, sd:].reshape(B, fd) if sd > 0 else R.reshape(B, fd)
    L_ref[...] = L
    Linv_ref[...] = jnp.stack(Linvs, axis=1)
    y_ref[...] = y.reshape(B, 1, fd)
    if Bc < B_real:  # batch grid: mask bad counts of padded rows
        base = pl.program_id(0) * Bc
        rid = base + jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        bad = jnp.where(rid < B_real, bad, 0.0)
    bad_ref[...] = bad
    if sd > 0:
        W_ref[...] = W
        U_ref[...] = Fall[:, fd:, fd:] - _dot("bkf,bkg->bfg", W, W)
        # Mosaic tpu.matmul wants canonical [B,1,k]x[B,k,f] for matvecs
        Wy = _dot("brk,bkf->brf", y.reshape(B_, 1, fd), W)[:, 0, :]
        ug_ref[...] = (gall[:, fd:] - Wy).reshape(B, 1, sd)
    else:
        W_ref[...] = jnp.zeros((B, fd, 1), dtype=dtype)
        U_ref[...] = jnp.zeros((B, 1, 1), dtype=dtype)
        ug_ref[...] = jnp.zeros((B, 1, 1), dtype=dtype)


def _padded_rows(second, last):
    """VMEM footprint rows of one [second, last] tile plane (f32 (8,128))."""
    return -(-second // 8) * 8 * (-(-last // 128) * 128)


def _vmem_bytes(B, nf, ns, d, bytes_per=4) -> int:
    """Per-chunk VMEM STACK estimate of the v2 kernel, tiling-aware: every
    [B, r, c] operand costs B * pad8(r) * pad128(c) elements. The block
    column loop is fully unrolled, and Mosaic does not alias the per-column
    temporaries (R/F/P copies) across iterations — the stack grows ~linearly
    in nf (measured: nf=32, ns=64, d=6, B=2 allocates 68 MB). Model that
    with an explicit nf * per-column term."""
    fd, sd = nf * d, ns * d
    m = fd + sd
    base = (
        _padded_rows(m, m)              # F block
        + _padded_rows(fd, fd)          # L accumulator
        + _padded_rows(fd, max(sd, 1))  # W
        + _padded_rows(max(sd, 1), max(sd, 1))  # U
        + nf * _padded_rows(d, d)       # Linv
        + 2 * _padded_rows(1, fd)       # y + scratch
    )
    per_column = (
        _padded_rows(fd, fd)            # F working copy
        + _padded_rows(fd, sd + 1)      # R copy
        + 3 * _padded_rows(fd, d)       # P / panel / yj
    )
    return B * (base + nf * per_column) * bytes_per


_VMEM_BUDGET = 6 * 2**20  # target stack per program
_VMEM_HARD = 13 * 2**20  # scoped-vmem compile limit is 16 MB; keep margin


def _chunk_for(B, nf, ns, d, bytes_per) -> int:
    per = max(1, _vmem_bytes(1, nf, ns, d, bytes_per))
    c = max(1, min(B, _VMEM_BUDGET // per))
    if c >= B:
        return B
    # chunked 2-D operands (gm, bad) put the batch axis in sublanes: the
    # block's second-to-last dim must be a multiple of 8
    return max(8, (c // 8) * 8)


@lru_cache(maxsize=None)
def _build(B, Bc, nf, ns, d, dtype_str, eps, interpret):
    """B: true bucket size; Bc: batch-chunk size per Mosaic program. The
    grid runs ceil(B/Bc) programs; inputs are padded to nblk*Bc outside."""
    fd, sd = nf * d, ns * d
    m = fd + sd
    dtype = jnp.dtype(dtype_str)
    nblk = -(-B // Bc)
    Bp = nblk * Bc
    kern = partial(_kernel, Bc, B, Bc, nf, sd, d, float(eps))
    out_shape = (
        jax.ShapeDtypeStruct((Bp, fd, fd), dtype),          # L
        jax.ShapeDtypeStruct((Bp, nf, d, d), dtype),        # Linv
        jax.ShapeDtypeStruct((Bp, fd, max(sd, 1)), dtype),  # W
        jax.ShapeDtypeStruct((Bp, 1, fd), dtype),           # y
        jax.ShapeDtypeStruct((Bp, max(sd, 1), max(sd, 1)), dtype),  # U
        jax.ShapeDtypeStruct((Bp, 1, max(sd, 1)), dtype),   # ug
        jax.ShapeDtypeStruct((Bp, 1), jnp.float32),         # bad (per clique)
    )
    vm = pltpu.VMEM

    def chunked(shape):
        ndim = len(shape)
        return pl.BlockSpec(
            (Bc,) + shape,
            lambda i: (i,) + (0,) * ndim,
            memory_space=vm,
        )

    def run(Fm, gm):
        if Bp != B:
            Fm = jnp.concatenate(
                [Fm, jnp.zeros((Bp - B, m, m), dtype=Fm.dtype)], axis=0
            )
            gm = jnp.concatenate(
                [gm, jnp.zeros((Bp - B, m), dtype=gm.dtype)], axis=0
            )
        outs = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[chunked((m, m)), chunked((m,))],
            out_shape=out_shape,
            out_specs=(
                chunked((fd, fd)),
                chunked((nf, d, d)),
                chunked((fd, max(sd, 1))),
                chunked((1, fd)),
                chunked((max(sd, 1), max(sd, 1))),
                chunked((1, max(sd, 1))),
                chunked((1,)),
            ),
            interpret=interpret,
        )(Fm, gm)
        L, Linv, W, y, U, ug, bad = outs
        if Bp != B:
            L, Linv, W, y, U, ug = (
                a[:B] for a in (L, Linv, W, y, U, ug)
            )
        y = y[:, 0, :]
        ug = ug[:, 0, :]
        if ns == 0:
            W = W[:, :, :0]
            U = U[:, :0, :0]
            ug = ug[:, :0]
        return dict(
            L=L, Linv=Linv, W=W, y=y, U=U, ug=ug,
            bad=jnp.sum(bad).astype(jnp.int32),
        )

    return run


def partial_cholesky(Fm, gm, nf: int, d: int, eps=1e-10, interpret=None):
    """Drop-in replacement for kernels.partial_cholesky: the whole bucket
    runs as a batch-chunked Mosaic grid, each program holding its chunk of
    cliques in VMEM with the block-column loop fully unrolled."""
    B, m, _ = Fm.shape
    ns = (m - nf * d) // d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bytes_per = jnp.dtype(Fm.dtype).itemsize
    Bc = _chunk_for(B, nf, ns, d, bytes_per)
    run = _build(B, Bc, nf, ns, d, str(Fm.dtype), float(eps), bool(interpret))
    return run(Fm, gm)


def _backsolve_kernel(B, nf, sd, d, L_ref, Linv_ref, W_ref, y_ref, xs_ref,
                      x_ref):
    """Solve L^T x = y - W xs for one chunk of cliques, fused in VMEM.

    Everything is expressed as canonical [B,1,k] x [B,k,f] matmuls — even
    the block extract/scatter (via one-hot selection matrices) — because
    lane-offset slices and 1-D reductions hit Mosaic layout holes (see the
    module docstring)."""
    fd = nf * d
    dtype = L_ref.dtype
    L = L_ref[...]
    y = y_ref[...]  # [B, 1, fd]
    if sd > 0:
        W = W_ref[...]
        xs = xs_ref[...]  # [B, 1, sd]
        # rhs = y - W^T-contracted xs: einsum("bfs,bs->bf") in transpose_rhs
        # form (contracting dim last on both operands)
        r = y - _dot("brs,bfs->brf", xs, W)
    else:
        r = y
    lane = jax.lax.broadcasted_iota(jnp.int32, (fd, d), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (fd, d), 1)
    x = jnp.zeros((B, 1, fd), dtype=dtype)
    for jj in range(nf):
        j = nf - 1 - jj
        jd = j * d
        Ej = (lane == sub + jd).astype(dtype)  # [fd, d] one-hot selector
        Ejb = jnp.broadcast_to(Ej.reshape(1, fd, d), (B, fd, d))
        rj = _dot("brf,bfk->brk", r, Ejb)  # [B, 1, d]
        Lcol = L[:, :, jd : jd + d]  # [B, fd, d] lane slice (matmul operand)
        rj = rj - _dot("brf,bfk->brk", x, Lcol)
        Linv_j = Linv_ref[:, j]  # [B, d, d]
        xj = _dot("brk,bkj->brj", rj, Linv_j)  # Linv_j^T rj
        x = x + _dot("brk,bfk->brf", xj, Ejb)  # scatter into block j
    x_ref[...] = x


@lru_cache(maxsize=None)
def _build_backsolve(B, Bc, nf, ns, d, dtype_str, interpret):
    fd, sd = nf * d, ns * d
    dtype = jnp.dtype(dtype_str)
    nblk = -(-B // Bc)
    Bp = nblk * Bc
    kern = partial(_backsolve_kernel, Bc, nf, sd, d)
    vm = pltpu.VMEM

    def chunked(shape):
        ndim = len(shape)
        return pl.BlockSpec(
            (Bc,) + shape, lambda i: (i,) + (0,) * ndim, memory_space=vm
        )

    def run(L, Linv, W, y, xs):
        if Bp != B:
            pad = lambda a: jnp.concatenate(
                [a, jnp.zeros((Bp - B,) + a.shape[1:], dtype=a.dtype)], axis=0
            )
            L, Linv, W, y, xs = pad(L), pad(Linv), pad(W), pad(y), pad(xs)
        out = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[
                chunked((fd, fd)),
                chunked((nf, d, d)),
                chunked((fd, max(sd, 1))),
                chunked((1, fd)),
                chunked((1, max(sd, 1))),
            ],
            out_shape=jax.ShapeDtypeStruct((Bp, 1, fd), dtype),
            out_specs=chunked((1, fd)),
            interpret=interpret,
        )(L, Linv, W, y, xs)
        return out[:B, 0, :]

    return run


def backsolve_bucket(L, Linv, W, y, xs, nf: int, d: int, interpret=None):
    """Fused top-down back-substitution for one bucket: solves
    L^T x = y - W @ xs. W/xs may be zero-width (root buckets)."""
    B, fd, _ = L.shape
    sd = W.shape[2]
    ns = sd // d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if sd == 0:
        W = jnp.zeros((B, fd, 1), dtype=L.dtype)
        xs = jnp.zeros((B, 1), dtype=L.dtype)
    bytes_per = jnp.dtype(L.dtype).itemsize
    per = (
        2 * _padded_rows(fd, fd)
        + nf * (_padded_rows(fd, d) * 3 + _padded_rows(d, d))
        + _padded_rows(fd, max(sd, 1))
        + 3 * _padded_rows(1, fd)
    ) * bytes_per
    Bc = max(1, min(B, _VMEM_BUDGET // max(1, per)))
    if Bc < B:
        Bc = max(8, (Bc // 8) * 8)
    run = _build_backsolve(
        B, Bc, nf, ns, d, str(L.dtype), bool(interpret)
    )
    return run(L, Linv, W, y.reshape(B, 1, fd), xs.reshape(B, 1, max(sd, 1)))


def backsolve_fits(B, nf, ns, d, bytes_per=4) -> bool:
    fd, sd = nf * d, ns * d
    per = (
        2 * _padded_rows(fd, fd)
        + nf * (_padded_rows(fd, d) * 3 + _padded_rows(d, d))
        + _padded_rows(fd, max(sd, 1))
        + 3 * _padded_rows(1, fd)
    ) * bytes_per
    return min(B, 8) * per <= _VMEM_HARD


def fits_vmem(B, nf, ns, d, bytes_per=4, budget=_VMEM_BUDGET) -> bool:
    """True when this bucket's chunked grid stays inside the Mosaic scoped
    VMEM limit (the batch axis chunks automatically, but a chunk is at
    least 1 clique — and at least 8 when the grid engages)."""
    Bc = _chunk_for(B, nf, ns, d, bytes_per)
    return _vmem_bytes(Bc, nf, ns, d, bytes_per) <= _VMEM_HARD
