"""Pallas TPU kernel v2: whole-BUCKET fused partial Cholesky.

The v1 kernel (ops/cholesky.py) runs one grid program per clique, which
serializes the batch axis that the XLA fori_loop path processes as one
vectorized op — measured SLOWER end-to-end (PROFILE_r04.md). v2 keeps the
clique batch INSIDE one Mosaic program: all bucket arrays live in VMEM,
the block-column loop is unrolled with static slices, and every step is a
batched op over [B, ...] — the same math as kernels.partial_cholesky with
the ~30 dependent HLO dispatches per column fused away.

STATUS: interpret-mode parity with kernels.partial_cholesky is tested
(test_pallas_cholesky.py); on-chip Mosaic lowering currently dies inside
the remote tpu_compile_helper with no diagnostics surfaced through the
axon tunnel (HTTP 500) — wiring it as the default eliminate path is a
round-5 item once the lowering failure can be inspected on a local
toolchain.
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
    pivs = []
    bad = jnp.zeros((), jnp.float32)
    for j in range(d):
        colW = W[:, :, j]
        pivot = colW[:, j]
        bad = bad + jnp.sum((pivot <= eps).astype(jnp.float32))
        piv = jnp.sqrt(jnp.maximum(pivot, eps))
        gtj = idx > j
        ej = (idx == j).astype(dtype)
        col = jnp.where(gtj, colW / piv[:, None], ej * piv[:, None])
        cols.append(col)
        pivs.append(piv)
        W = W - col[:, :, None] * col[:, None, :]
    L = jnp.stack(cols, axis=2)
    piv = jnp.stack(pivs, axis=1)
    inv_piv = 1.0 / piv
    Lc = L * inv_piv[:, None, :]
    X = 2.0 * eye - Lc
    for _ in range(max(0, int(np.ceil(np.log2(d))) - 1)):
        X = _dot("bij,bjk->bik", X, 2.0 * eye - _dot("bij,bjk->bik", Lc, X))
    Linv = X * inv_piv[:, :, None]
    return L, Linv, bad


def _kernel(B, nf, sd, d, eps, F_ref, g_ref, L_ref, Linv_ref, W_ref, y_ref,
            U_ref, ug_ref, bad_ref):
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
    bad = jnp.zeros((), jnp.float32)
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
    bad_ref[0, 0] = bad
    if sd > 0:
        W_ref[...] = W
        U_ref[...] = Fall[:, fd:, fd:] - _dot("bkf,bkg->bfg", W, W)
        ug_ref[...] = (gall[:, fd:] - _dot("bkf,bk->bf", W, y)).reshape(
            B, 1, sd
        )
    else:
        W_ref[...] = jnp.zeros((B, fd, 1), dtype=dtype)
        U_ref[...] = jnp.zeros((B, 1, 1), dtype=dtype)
        ug_ref[...] = jnp.zeros((B, 1, 1), dtype=dtype)


@lru_cache(maxsize=None)
def _build(B, nf, ns, d, dtype_str, eps, interpret):
    fd, sd = nf * d, ns * d
    m = fd + sd
    dtype = jnp.dtype(dtype_str)
    kern = partial(_kernel, B, nf, sd, d, float(eps))
    out_shape = (
        jax.ShapeDtypeStruct((B, fd, fd), dtype),          # L
        jax.ShapeDtypeStruct((B, nf, d, d), dtype),        # Linv
        jax.ShapeDtypeStruct((B, fd, max(sd, 1)), dtype),  # W
        jax.ShapeDtypeStruct((B, 1, fd), dtype),           # y
        jax.ShapeDtypeStruct((B, max(sd, 1), max(sd, 1)), dtype),  # U
        jax.ShapeDtypeStruct((B, 1, max(sd, 1)), dtype),   # ug
        jax.ShapeDtypeStruct((1, 1), jnp.float32),         # bad
    )
    vm = pltpu.VMEM

    def full(shape):
        return pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=vm)

    def run(Fm, gm):
        outs = pl.pallas_call(
            kern,
            in_specs=[full((B, m, m)), full((B, m))],
            out_shape=out_shape,
            out_specs=(
                full((B, fd, fd)),
                full((B, nf, d, d)),
                full((B, fd, max(sd, 1))),
                full((B, 1, fd)),
                full((B, max(sd, 1), max(sd, 1))),
                full((B, 1, max(sd, 1))),
                pl.BlockSpec((1, 1), lambda: (0, 0), memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(Fm, gm)
        L, Linv, W, y, U, ug, bad = outs
        y = y[:, 0, :]
        ug = ug[:, 0, :]
        if ns == 0:
            W = W[:, :, :0]
            U = U[:, :0, :0]
            ug = ug[:, :0]
        return dict(
            L=L, Linv=Linv, W=W, y=y, U=U, ug=ug,
            bad=bad[0, 0].astype(jnp.int32),
        )

    return run


def partial_cholesky(Fm, gm, nf: int, d: int, eps=1e-10, interpret=None):
    """Drop-in replacement for kernels.partial_cholesky (whole bucket in
    one Mosaic program)."""
    B, m, _ = Fm.shape
    ns = (m - nf * d) // d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build(B, nf, ns, d, str(Fm.dtype), float(eps), bool(interpret))
    return run(Fm, gm)


def fits_vmem(B, nf, ns, d, bytes_per=4, budget=10 * 2**20) -> bool:
    """Conservative VMEM working-set estimate for the v2 kernel."""
    m = (nf + ns) * d
    fd, sd = nf * d, ns * d
    ws = B * (m * m + 2 * fd * fd + fd * (sd + 1) + sd * sd) * bytes_per
    return ws <= budget
