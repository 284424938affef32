"""Schur-complement bundle-adjustment solver: batched landmark elimination.

The reference eliminates landmarks per smart factor via
CameraSet::SchurComplement (gtsam/geometry/CameraSet.h:175-241) building the
m*dc+1 reduced camera Hessian per track. Here ALL tracks are eliminated in
one batched pass:

  H_pp[j]  = sum_obs E^T E   (+ point priors, + damping)   [T, 3, 3]
  g_p[j]   = sum_obs E^T b
  W[o]     = F^T E                                         [O, dc, 3]
  S        = H_cc - sum_{(a,b) in same track} W[a] Hpp[j]^-1 W[b]^T
  g_c      = g_cc - sum_obs W Hpp^-1 g_p
  solve S dx_c = g_c (dense Cholesky; cameras are few), then back-substitute
  dx_p[j] = Hpp[j]^-1 (g_p[j] - sum_obs E^T F dx_c).

Obs-pair index arrays are precomputed on host (plan); everything else is
segment-sum / gather / batched 3x3 solves — MXU + VPU friendly with no
host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.nonlinear.factor_graph import LinearizedGraph

POINT_TYPE = "Point3"


@dataclass
class SchurPlan:
    cam_type: str
    dc: int
    n_cams: int
    n_pts: int
    # projection batches: (batch_idx, cam_slot, pt_slot)
    proj: List[Tuple[int, int, int]]
    # camera-only batches: (batch_idx, [slots])
    cam_only: List[Tuple[int, List[int]]]
    # point-only (unary) batches: (batch_idx, slot)
    pt_only: List[Tuple[int, int]]
    # obs-pair arrays per projection batch: (pair_a, pair_b) local obs indices
    pairs: List[Tuple[np.ndarray, np.ndarray]]


def build_schur_plan(lg: LinearizedGraph) -> SchurPlan:
    types = set(lg.type_counts.keys())
    assert POINT_TYPE in types and len(types) == 2, types
    if any(lb.sign != 1.0 for lb in lg.batches):
        raise NotImplementedError(
            "schur solver does not support sign=-1 (AntiFactor) batches; "
            "use the dense or multifrontal solver"
        )
    cam_type = next(t for t in types if t != POINT_TYPE)
    dc = manifold.get(cam_type).dim
    proj, cam_only, pt_only, pairs = [], [], [], []
    for bi, lb in enumerate(lg.batches):
        vt = lb.var_types
        if POINT_TYPE in vt and cam_type in vt:
            assert len(vt) == 2
            cs = vt.index(cam_type)
            ps = vt.index(POINT_TYPE)
            proj.append((bi, cs, ps))
            # group obs by point row -> all ordered pairs within the track
            rows = np.asarray(lb.rows[ps])
            order = np.argsort(rows, kind="stable")
            pa, pb = [], []
            s = 0
            while s < len(order):
                e = s
                while e < len(order) and rows[order[e]] == rows[order[s]]:
                    e += 1
                idx = order[s:e]
                A, B = np.meshgrid(idx, idx, indexing="ij")
                pa.append(A.reshape(-1))
                pb.append(B.reshape(-1))
                s = e
            pairs.append(
                (
                    np.concatenate(pa) if pa else np.zeros(0, np.int64),
                    np.concatenate(pb) if pb else np.zeros(0, np.int64),
                )
            )
        elif POINT_TYPE in vt:
            assert len(vt) == 1, "point-point factors unsupported in Schur path"
            pt_only.append((bi, 0))
        else:
            cam_only.append((bi, list(range(len(vt)))))
    return SchurPlan(
        cam_type=cam_type,
        dc=dc,
        n_cams=lg.type_counts[cam_type],
        n_pts=lg.type_counts[POINT_TYPE],
        proj=proj,
        cam_only=cam_only,
        pt_only=pt_only,
        pairs=pairs,
    )


def schur_solve(
    plan: SchurPlan,
    rows_static,
    Ab,
    lam=0.0,
    diagonal_damping: bool = False,
):
    """Returns delta {cam_type: [C, dc], 'Point3': [T, 3]}.

    rows_static: per batch, tuple of np row arrays (plan-time constants).
    Ab: per batch, (A_blocks tuple, b) arrays — a plain pytree for jit.
    """
    dc = plan.dc
    C_, T_ = plan.n_cams, plan.n_pts
    dtype = Ab[0][1].dtype
    lam = jnp.asarray(lam, dtype=dtype)
    Dc = C_ * dc

    H_pp = jnp.zeros((T_, 3, 3), dtype=dtype)
    g_p = jnp.zeros((T_, 3), dtype=dtype)
    Hcc = jnp.zeros((Dc, Dc), dtype=dtype)
    g_c = jnp.zeros((Dc,), dtype=dtype)

    def cam_gidx(rows):
        base = jnp.asarray(rows, dtype=jnp.int32) * dc
        return base[:, None] + jnp.arange(dc, dtype=jnp.int32)[None, :]

    # point-only priors
    for (bi, slot) in plan.pt_only:
        A_, b_ = Ab[bi]
        E = A_[slot]
        r = jnp.asarray(rows_static[bi][slot])
        H_pp = H_pp.at[r].add(jnp.einsum("ndi,ndj->nij", E, E))
        g_p = g_p.at[r].add(jnp.einsum("ndi,nd->ni", E, b_))

    # camera-only factors -> dense camera system
    for (bi, slots) in plan.cam_only:
        A_, b_ = Ab[bi]
        gidx = [cam_gidx(rows_static[bi][k]) for k in slots]
        for a, k in enumerate(slots):
            g_c = g_c.at[gidx[a]].add(jnp.einsum("ndi,nd->ni", A_[k], b_))
            for b2, l in enumerate(slots):
                blk = jnp.einsum("ndi,ndj->nij", A_[k], A_[l])
                Hcc = Hcc.at[gidx[a][:, :, None], gidx[b2][:, None, :]].add(blk)

    # projection factors
    Ws, cam_rows, pt_rows, Es, Fs, bs = [], [], [], [], [], []
    for pi, (bi, cs, ps) in enumerate(plan.proj):
        A_, b_ = Ab[bi]
        F = A_[cs]  # [N, d, dc]
        E = A_[ps]  # [N, d, 3]
        b = b_
        crow = jnp.asarray(rows_static[bi][cs])
        prow = jnp.asarray(rows_static[bi][ps])
        H_pp = H_pp.at[prow].add(jnp.einsum("ndi,ndj->nij", E, E))
        g_p = g_p.at[prow].add(jnp.einsum("ndi,nd->ni", E, b))
        gidx = cam_gidx(crow)
        g_c = g_c.at[gidx].add(jnp.einsum("ndi,nd->ni", F, b))
        Hcc = Hcc.at[gidx[:, :, None], gidx[:, None, :]].add(
            jnp.einsum("ndi,ndj->nij", F, F)
        )
        Ws.append(jnp.einsum("ndi,ndj->nij", F, E))  # [N, dc, 3]
        cam_rows.append(crow)
        pt_rows.append(prow)
        Es.append(E)
        Fs.append(F)
        bs.append(b)

    # damping
    eye3 = jnp.eye(3, dtype=dtype)
    if diagonal_damping:
        H_pp = H_pp + lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diagonal)(H_pp))
        Hcc = Hcc + lam * jnp.diag(jnp.diagonal(Hcc))
    else:
        H_pp = H_pp + lam * eye3
        Hcc = Hcc + lam * jnp.eye(Dc, dtype=dtype)

    Hpp_inv = jnp.linalg.inv(H_pp + 1e-12 * eye3)  # [T, 3, 3]

    # Schur: subtract W_a Hpp^-1 W_b^T over same-track obs pairs
    for pi, (bi, cs, ps) in enumerate(plan.proj):
        W = Ws[pi]
        crow = cam_rows[pi]
        prow = pt_rows[pi]
        pa, pb = plan.pairs[pi]
        pa = jnp.asarray(pa)
        pb = jnp.asarray(pb)
        Hinv_j = Hpp_inv[prow[pa]]  # [P, 3, 3]
        contrib = jnp.einsum("pij,pjk,plk->pil", W[pa], Hinv_j, W[pb])  # [P,dc,dc]
        ga = cam_gidx(crow[pa])
        gb = cam_gidx(crow[pb])
        Hcc = Hcc.at[ga[:, :, None], gb[:, None, :]].add(-contrib)
        # rhs: g_c -= W Hpp^-1 g_p (once per obs)
        gc_contrib = jnp.einsum("nij,njk,nk->ni", W, Hpp_inv[prow], g_p[prow])
        g_c = g_c.at[cam_gidx(crow)].add(-gc_contrib)

    # reduced camera solve
    L, low = jax.scipy.linalg.cho_factor(Hcc, lower=True)
    xc = jax.scipy.linalg.cho_solve((L, low), g_c)

    # back-substitute points: dx_p = Hpp^-1 (g_p - sum E^T F dx_c)
    rhs_p = g_p
    for pi, (bi, cs, ps) in enumerate(plan.proj):
        crow = cam_rows[pi]
        prow = pt_rows[pi]
        xc_obs = xc.reshape(C_, dc)[crow]  # [N, dc]
        EtF = jnp.einsum("ndi,ndj->nij", Es[pi], Fs[pi])  # [N, 3, dc]
        rhs_p = rhs_p.at[prow].add(-jnp.einsum("nij,nj->ni", EtF, xc_obs))
    xp = jnp.einsum("tij,tj->ti", Hpp_inv, rhs_p)

    return {plan.cam_type: xc.reshape(C_, dc), POINT_TYPE: xp}


# --- optimizer integration ---------------------------------------------------

_SCHUR_CACHE: Dict = {}


def solve_linearized(graph, values, lam, diagonal_damping=False, cache=None):
    """Optimizer hook (solver='schur')."""
    cache = cache if cache is not None else {}
    if cache.get("schur_lg") is None:
        cache["schur_lg"] = graph.linearize(values)
    lg = cache["schur_lg"]

    key = id(graph)
    ent = _SCHUR_CACHE.get(key)
    if ent is None:
        plan = build_schur_plan(lg)
        rows_static = tuple(
            tuple(np.asarray(r) for r in lb.rows) for lb in lg.batches
        )
        from functools import partial

        fn = jax.jit(
            partial(schur_solve, plan, rows_static),
            static_argnames=("diagonal_damping",),
        )
        _SCHUR_CACHE[key] = (plan, fn)
        ent = _SCHUR_CACHE[key]
    plan, fn = ent

    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    delta = fn(Ab, lam, diagonal_damping=diagonal_damping)

    from gtsam_petercdev_tpu.linear import solve as linsolve

    g = linsolve.gradient(lg)
    Hd = linsolve.hvp(lg, delta)
    lin_dec = sum(jnp.vdot(g[t], delta[t]) for t in delta) - 0.5 * sum(
        jnp.vdot(delta[t], Hd[t]) for t in delta
    )
    return delta, lin_dec
