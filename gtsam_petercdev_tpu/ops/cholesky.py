"""Pallas TPU kernel: fused per-clique partial block-Cholesky.

The XLA implementation (inference/kernels.py partial_cholesky) runs one
`fori_loop` of ~8 small HLO ops per block column; a sphere2500 elimination
sweep issues ~2000 such dependent micro-ops and is op-overhead-bound
(~44 ms device time for a few GFLOP). This kernel fuses one clique's ENTIRE
factorization — LLT of the frontal block, panel TRSM, SYRK downdate, RHS
forward-substitution, Schur complement — into a single Mosaic program over a
grid of cliques; all intermediates live in VMEM.

Math is identical to gtsam/base/cholesky.cpp:106-159 (choleskyPartial) with
clamped-and-counted non-positive pivots (choleskyCareful semantics).

Layout per program (one clique of the bucket):
    F [m, m] symmetric, m = (nf + ns_blocks) * d; first fd = nf*d frontal.
    Fixed-point outputs match kernels.partial_cholesky's dict.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_einsum = partial(jnp.einsum, precision=lax.Precision.HIGHEST)
# f32 matmuls on TPU default to bf16 passes; Cholesky needs full f32
_dot = partial(jnp.dot, precision=lax.Precision.HIGHEST)


def _kernel(nf, ns, d, eps, F_ref, g_ref, L_ref, Linv_ref, W_ref, y_ref,
            U_ref, ug_ref, bad_ref, scratch, R_ref):
    fd = nf * d
    sd = ns * d
    dtype = F_ref.dtype

    # copy the frontal block into scratch (mutated by the SYRK downdates)
    scratch[:, :] = F_ref[0, :fd, :fd]
    # RHS panel [fd, sd+d]: separator coupling | g (padded into d cols)
    if ns > 0:
        R_ref[:, :sd] = F_ref[0, :fd, fd:]
    R_ref[:, sd] = g_ref[0, 0, :fd]
    bad_ref[0, 0, 0] = jnp.int32(0)

    row_ids = lax.broadcasted_iota(jnp.int32, (fd, 1), 0)

    def col_step(j, _):
        jd = j * d
        Dj = scratch[pl.ds(jd, d), pl.ds(jd, d)]  # [d, d]

        # unrolled dense Cholesky of the [d, d] diagonal block
        idx2 = lax.broadcasted_iota(jnp.int32, (d, d), 0)  # row ids
        col2 = lax.broadcasted_iota(jnp.int32, (d, d), 1)  # col ids
        Wd = Dj
        Lj = jnp.zeros((d, d), dtype=dtype)
        bad = jnp.int32(0)
        for jj in range(d):
            pivot = Wd[jj, jj]
            bad = bad + (pivot <= eps).astype(jnp.int32)
            piv = jnp.sqrt(jnp.maximum(pivot, eps))
            col = Wd[:, jj : jj + 1] / piv  # [d, 1]
            col = jnp.where(idx2[:, :1] > jj, col, 0.0)
            col = jnp.where(idx2[:, :1] == jj, piv, col)
            Lj = jnp.where(col2 == jj, col, Lj)
            Wd = Wd - col * col.T
        # forward-substitution inverse of Lj (unrolled, row at a time)
        Linv_j = jnp.zeros((d, d), dtype=dtype)
        for i in range(d):
            e = jnp.where(
                (idx2[:1, :] * 0 + col2[:1, :]) == i,
                jnp.ones((1, d), dtype=dtype),
                jnp.zeros((1, d), dtype=dtype),
            )  # e_i as [1, d]
            acc = e - _dot(
                Lj[i : i + 1, :], Linv_j, preferred_element_type=dtype
            )
            Linv_j = jnp.where(idx2 == i, acc / Lj[i, i], Linv_j)
        bad_ref[0, 0, 0] += bad

        # panel: P = F[:, j-block] Linv_j^T, masked to strictly-below rows
        panel = scratch[:, pl.ds(jd, d)]  # [fd, d]
        P = _dot(panel, Linv_j.T, preferred_element_type=dtype)
        P = jnp.where(row_ids >= (jd + d), P, 0.0)

        # store L column block: masked panel, then Lj on the diagonal block
        L_ref[0, :, pl.ds(jd, d)] = P
        L_ref[0, pl.ds(jd, d), pl.ds(jd, d)] = Lj
        Linv_ref[0, j, :, :] = Linv_j

        # forward substitution on [F12 | g]
        Rj = R_ref[pl.ds(jd, d), :]  # [d, sd+d]
        yj = _dot(Linv_j, Rj, preferred_element_type=dtype)
        R_ref[pl.ds(jd, d), :] = yj
        R_ref[:, :] = R_ref[:, :] - _dot(
            P, yj, preferred_element_type=dtype
        )
        # SYRK trailing update (P zero on factored + diagonal rows)
        scratch[:, :] = scratch[:, :] - _dot(
            P, P.T, preferred_element_type=dtype
        )
        return 0

    # Mosaic cannot lower dynamic-offset sub-tile (d x d) vector loads, so
    # the block-column loop is fully unrolled: every slice offset is static.
    for _j in range(nf):
        col_step(_j, 0)

    y_ref[0, 0, :] = R_ref[:, sd]
    if ns > 0:
        W = R_ref[:, :sd]
        W_ref[0, :, :] = W
        U_ref[0, :, :] = F_ref[0, fd:, fd:] - _dot(
            W.T, W, preferred_element_type=dtype
        )
        ug_ref[0, 0, :] = g_ref[0, 0, fd:] - _dot(
            W.T, R_ref[:, sd], preferred_element_type=dtype
        )


@lru_cache(maxsize=None)
def _build(B, nf, ns, d, dtype_str, eps, interpret):
    fd, sd = nf * d, ns * d
    m = fd + sd
    dtype = jnp.dtype(dtype_str)

    kern = partial(_kernel, nf, ns, d, float(eps))

    # Mosaic block rule: last two dims of each block must be (8k, 128k) or
    # equal the full array dims — so every per-program 1D quantity rides a
    # [B, 1, len] layout whose (1, len) block covers the full trailing dims.
    out_shape = (
        jax.ShapeDtypeStruct((B, fd, fd), dtype),       # L
        jax.ShapeDtypeStruct((B, nf, d, d), dtype),     # Linv
        jax.ShapeDtypeStruct((B, fd, max(sd, 1)), dtype),  # W (min 1 col)
        jax.ShapeDtypeStruct((B, 1, fd), dtype),        # y
        jax.ShapeDtypeStruct((B, max(sd, 1), max(sd, 1)), dtype),  # U
        jax.ShapeDtypeStruct((B, 1, max(sd, 1)), dtype),  # ug
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),     # bad (SMEM)
    )
    grid = (B,)

    def bspec(shp):
        return pl.BlockSpec(
            (1,) + shp,
            lambda i: (i,) + (0,) * len(shp),
            memory_space=pltpu.VMEM,
        )

    in_specs = [bspec((m, m)), bspec((1, m))]
    out_specs = (
        bspec((fd, fd)),
        bspec((nf, d, d)),
        bspec((fd, max(sd, 1))),
        bspec((1, fd)),
        bspec((max(sd, 1), max(sd, 1))),
        bspec((1, max(sd, 1))),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    )

    def run(Fm, gm):
        def kernel_wrap(F_ref, g_ref, L_ref, Linv_ref, W_ref, y_ref,
                        U_ref, ug_ref, bad_ref, scratch, R_ref):
            kern(F_ref, g_ref, L_ref, Linv_ref, W_ref, y_ref, U_ref,
                 ug_ref, bad_ref, scratch, R_ref)

        outs = pl.pallas_call(
            kernel_wrap,
            grid=grid,
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((fd, fd), dtype),
                pltpu.VMEM((fd, sd + d), dtype),
            ],
            interpret=interpret,
        )(Fm, gm[:, None, :])
        L, Linv, W, y, U, ug, bad = outs
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
    """Drop-in replacement for kernels.partial_cholesky on TPU.

    interpret=None auto-selects interpreter mode off-TPU (CPU tests)."""
    B, m, _ = Fm.shape
    ns = (m - nf * d) // d
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build(B, nf, ns, d, str(Fm.dtype), float(eps), bool(interpret))
    return run(Fm, gm)


# ---------------------------------------------------------------------------
# block-layout variant: consumes the elimination block pool directly
# ---------------------------------------------------------------------------


def _kernel_blocks(nf, ns, d, eps, F_ref, g_ref, L_ref, Linv_ref, W_ref,
                   y_ref, U_ref, ug_ref, bad_ref, scratch, R_ref):
    """Same math as _kernel, but input F arrives as [mb*mb, d, d] blocks in
    ROW-MAJOR block order (the elimination pool layout) and U leaves as
    [ns*ns, d, d] blocks — the HBM re-layout transposes that dominated the
    XLA sweep (~33 ms/step on sphere2500) become VMEM-local relayouts."""
    mb = nf + ns
    fd, sd = nf * d, ns * d
    m = mb * d
    dtype = F_ref.dtype

    # Mosaic cannot shape-cast [mb, mb, d, d] -> [m, m]; assemble the dense
    # frontal matrix with static per-block copies instead (VMEM-local).
    for i in range(nf):
        for j in range(nf):
            scratch[i * d : (i + 1) * d, j * d : (j + 1) * d] = F_ref[
                i * mb + j, :, :
            ]
        for j in range(ns):
            R_ref[i * d : (i + 1) * d, j * d : (j + 1) * d] = F_ref[
                i * mb + nf + j, :, :
            ]
    R_ref[:, sd] = g_ref[0, 0, :fd]
    bad_ref[0, 0, 0] = jnp.int32(0)

    row_ids = lax.broadcasted_iota(jnp.int32, (fd, 1), 0)

    def col_step(j):
        jd = j * d
        Dj = scratch[pl.ds(jd, d), pl.ds(jd, d)]
        idx2 = lax.broadcasted_iota(jnp.int32, (d, d), 0)
        col2 = lax.broadcasted_iota(jnp.int32, (d, d), 1)
        Wd = Dj
        Lj = jnp.zeros((d, d), dtype=dtype)
        bad = jnp.int32(0)
        for jj in range(d):
            pivot = Wd[jj, jj]
            bad = bad + (pivot <= eps).astype(jnp.int32)
            piv = jnp.sqrt(jnp.maximum(pivot, eps))
            col = Wd[:, jj : jj + 1] / piv
            col = jnp.where(idx2[:, :1] > jj, col, 0.0)
            col = jnp.where(idx2[:, :1] == jj, piv, col)
            Lj = jnp.where(col2 == jj, col, Lj)
            Wd = Wd - col * col.T
        Linv_j = jnp.zeros((d, d), dtype=dtype)
        for i in range(d):
            e = jnp.where(
                col2[:1, :] == i,
                jnp.ones((1, d), dtype=dtype),
                jnp.zeros((1, d), dtype=dtype),
            )
            acc = e - _dot(Lj[i : i + 1, :], Linv_j, preferred_element_type=dtype)
            Linv_j = jnp.where(idx2 == i, acc / Lj[i, i], Linv_j)
        bad_ref[0, 0, 0] += bad

        panel = scratch[:, pl.ds(jd, d)]
        P = _dot(panel, Linv_j.T, preferred_element_type=dtype)
        P = jnp.where(row_ids >= (jd + d), P, 0.0)
        L_ref[0, :, pl.ds(jd, d)] = P
        L_ref[0, pl.ds(jd, d), pl.ds(jd, d)] = Lj
        Linv_ref[0, j, :, :] = Linv_j

        Rj = R_ref[pl.ds(jd, d), :]
        yj = _dot(Linv_j, Rj, preferred_element_type=dtype)
        R_ref[pl.ds(jd, d), :] = yj
        R_ref[:, :] = R_ref[:, :] - _dot(P, yj, preferred_element_type=dtype)
        scratch[:, :] = scratch[:, :] - _dot(P, P.T, preferred_element_type=dtype)

    for _j in range(nf):
        col_step(_j)

    y_ref[0, 0, :] = R_ref[:, sd]
    if ns > 0:
        W = R_ref[:, :sd]
        W_ref[0, :, :] = W
        WtW = _dot(W.T, W, preferred_element_type=dtype)  # [sd, sd]
        ugv = g_ref[0, 0, fd:] - _dot(
            W.T, R_ref[:, sd], preferred_element_type=dtype
        )
        for a in range(ns):
            for b in range(ns):
                U_ref[0, a * ns + b, :, :] = (
                    F_ref[(nf + a) * mb + nf + b, :, :]
                    - WtW[a * d : (a + 1) * d, b * d : (b + 1) * d]
                )
            ug_ref[0, a, :] = ugv[a * d : (a + 1) * d]


@lru_cache(maxsize=None)
def _build_blocks(B, nf, ns, d, dtype_str, eps, interpret):
    fd, sd = nf * d, ns * d
    mb = nf + ns
    dtype = jnp.dtype(dtype_str)
    kern = partial(_kernel_blocks, nf, ns, d, float(eps))

    nsb = max(ns, 1)
    out_shape = (
        jax.ShapeDtypeStruct((B, fd, fd), dtype),
        jax.ShapeDtypeStruct((B, nf, d, d), dtype),
        jax.ShapeDtypeStruct((B, fd, max(sd, 1)), dtype),
        jax.ShapeDtypeStruct((B, 1, fd), dtype),
        jax.ShapeDtypeStruct((B, nsb * nsb, d, d), dtype),  # U blocks
        jax.ShapeDtypeStruct((B, nsb, d), dtype),           # ug blocks
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
    )
    grid = (B,)

    def bspec(shp):
        return pl.BlockSpec(
            (1,) + shp, lambda i: (i,) + (0,) * len(shp),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((mb * mb, d, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        bspec((1, mb * d)),
    ]
    out_specs = (
        bspec((fd, fd)),
        bspec((nf, d, d)),
        bspec((fd, max(sd, 1))),
        bspec((1, fd)),
        bspec((nsb * nsb, d, d)),
        bspec((nsb, d)),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    )

    def run(Fblocks, gblocks):
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=in_specs,
            out_shape=out_shape,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((fd, fd), dtype),
                pltpu.VMEM((fd, sd + d), dtype),
            ],
            interpret=interpret,
        )(Fblocks, gblocks)
        L, Linv, W, y, Ub, ugb, bad = outs
        y = y[:, 0, :]
        if ns == 0:
            W = W[:, :, :0]
            Ub = Ub[:, :0]
            ugb = ugb[:, :0]
        return dict(
            L=L, Linv=Linv, W=W, y=y, U_blocks=Ub, ug_blocks=ugb,
            bad=jnp.sum(bad).astype(jnp.int32),
        )

    return run


def partial_cholesky_blocks(Fblocks, gblocks, nf: int, ns: int, d: int,
                            eps=1e-10, interpret=None):
    """Block-pool-native partial Cholesky.

    Fblocks: [B*mb*mb, d, d] row-major clique blocks (pool slice);
    gblocks: [B, mb, d]. Returns U/ug in block layout for direct extend-add.
    """
    mb = nf + ns
    B = gblocks.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = _build_blocks(B, nf, ns, d, str(Fblocks.dtype), float(eps),
                        bool(interpret))
    return run(Fblocks, gblocks.reshape(B, 1, mb * d))
