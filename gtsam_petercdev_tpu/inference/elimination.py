"""Batched supernodal multifrontal Cholesky — the device execution of an
EliminationPlan.

Per tree level (bottom-up), all same-shape cliques are processed by ONE
batched dense partial-Cholesky kernel — LLT of the frontal block, triangular
solve of the separator coupling, SYRK downdate — exactly the math of the
reference's per-clique hot loop (base/cholesky.cpp:106-159 choleskyPartial)
but vmapped over a shape bucket so it tiles onto the MXU. Child->parent
extend-add (ClusterTree-inst.h:219-268) becomes precomputed flat scatter-adds
into a single global frontal buffer. Back-substitution
(GaussianConditional.cpp:218 solve) is the mirrored top-down level sweep.

All host irregularity lives in the plan; this module is pure jittable array
code given the plan's (static) index maps.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.inference.symbolic import (
    Bucket,
    Clique,
    EliminationPlan,
    symbolic_eliminate,
)
from gtsam_petercdev_tpu.nonlinear.factor_graph import LinearizedGraph


@dataclass
class NumericMaps:
    """Static index maps binding a LinearizedGraph's structure to a plan."""

    plan: EliminationPlan
    # factor scatter: per (batch, k, l): flat target [N, d, d] into F_flat
    fac_F_idx: List[Tuple[int, int, int, np.ndarray]]
    # per (batch, k): flat target [N, d] into g_flat
    fac_g_idx: List[Tuple[int, int, np.ndarray]]
    # padding diagonal ones: [P] indices into F_flat
    pad_diag_idx: np.ndarray
    # diag damping targets: [n, d] indices of each var's diagonal entries
    # (in PERMUTED var order; each var's diagonal is written once, at its
    # owning clique — note the assembled F is NOT H there, contributions are
    # distributed across descendants, so damping values must be computed
    # from the Jacobians, not read back from F)
    var_diag_idx: np.ndarray
    # per (batch, slot): original variable rows [N] (for diag(H) computation)
    slot_rows: List[Tuple[int, int, np.ndarray]]
    # per level: list over buckets of extend-add maps
    #   (U_dst [B, sd, sd], ug_dst [B, sd]) flat indices (trash for pads)
    ext_F_dst: List[List[np.ndarray]]
    ext_g_dst: List[List[np.ndarray]]
    # back-substitution: per level/bucket: sep gather [B, sd] into x_flat,
    # frontal scatter [B, fd] into x_flat (trash for pads)
    sep_gather: List[List[np.ndarray]]
    front_scatter: List[List[np.ndarray]]
    # per level/bucket: gather of frontal matrices from F_flat [B, m*d, m*d]
    F_gather: List[List[np.ndarray]]
    g_gather: List[List[np.ndarray]]
    x_size: int


def build_plan_for_graph(
    lg_rows: List[Tuple[Tuple[np.ndarray, ...], str]],
    n_vars: int,
    d: int,
    ordering: Optional[np.ndarray] = None,
) -> EliminationPlan:
    factor_vars = [np.stack(rows, axis=1).astype(np.int64) for rows, _t in lg_rows]
    return symbolic_eliminate(n_vars, factor_vars, d, ordering=ordering)


def graph_structure(graph, values):
    """Host-only structure extraction: per batch (var_types, rows) — no
    device work (critical: eager ops are remote round-trips on TPU)."""
    graph._materialize()
    out = []
    for batch in graph.batches:
        rows = tuple(
            values.rows(batch.keys[:, k], t)
            for k, t in enumerate(batch.ftype.var_types)
        )
        out.append((batch.ftype.var_types, rows))
    return out


def build_numeric_maps(plan: EliminationPlan, structure) -> NumericMaps:
    """structure: list of (var_types, rows-tuple) per batch — host data only
    (a LinearizedGraph also works via its .batches attributes)."""
    if hasattr(structure, "batches"):
        structure = [(lb.var_types, lb.rows) for lb in structure.batches]
    d = plan.d
    iperm = plan.iperm
    cliques = plan.cliques
    base = plan._base
    vec_base = plan._vec_base
    trash_F = plan.F_size - 1
    trash_g = plan.g_size - 1

    def clique_pos(c: Clique, pv: int) -> int:
        """Block position of permuted var pv in clique c's PADDED frontal."""
        if pv in c._fpos:
            return c._fpos[pv]
        return c.bucket[0] + c._spos[pv]

    # index lookups per clique
    for c in cliques:
        c._fpos = {v: i for i, v in enumerate(c.frontal)}
        c._spos = {v: i for i, v in enumerate(c.separator)}

    ar = np.arange(d, dtype=np.int64)

    fac_F_idx = []
    fac_g_idx = []
    slot_rows = []
    for bi, (var_types, brows) in enumerate(structure):
        K = len(var_types)
        rows = [np.asarray(r, dtype=np.int64) for r in brows]
        pvs = [iperm[r] for r in rows]  # permuted var ids [N]
        minpv = np.minimum.reduce(pvs) if K > 1 else pvs[0]
        own = plan.var_clique[minpv]  # clique id per factor [N]
        N = rows[0].shape[0]
        m_arr = np.array(
            [(cliques[cid].bucket[0] + cliques[cid].bucket[1]) * d for cid in own],
            dtype=np.int64,
        )
        cb = base[own]  # [N]
        vb = vec_base[own]
        pos = []
        for k in range(K):
            pk = np.array(
                [clique_pos(cliques[own[n]], pvs[k][n]) for n in range(N)],
                dtype=np.int64,
            )
            pos.append(pk * d)
        for k in range(K):
            slot_rows.append((bi, k, rows[k]))
            row_idx = cb[:, None] + (pos[k][:, None] + ar[None, :]) * m_arr[:, None]  # [N, d]
            g_idx = vb[:, None] + pos[k][:, None] + ar[None, :]
            fac_g_idx.append((bi, k, g_idx))
            for l in range(K):
                col = pos[l][:, None] + ar[None, :]  # [N, d]
                full = row_idx[:, :, None] + col[:, None, :]  # [N, d, d]
                fac_F_idx.append((bi, k, l, full))

    # padding diagonal ones + per-var diagonal indices
    pad_diag = []
    var_diag = np.zeros((plan.n, d), dtype=np.int64)
    for c in cliques:
        nf_pad, ns_pad = c.bucket
        m = (nf_pad + ns_pad) * d
        for i, v in enumerate(c.frontal):
            p = i * d
            var_diag[v] = base[c.cid] + (p + ar) * m + (p + ar)
        for i in range(len(c.frontal), nf_pad):
            p = i * d
            pad_diag.extend(base[c.cid] + (p + ar) * m + (p + ar))
    pad_diag_idx = np.asarray(pad_diag, dtype=np.int64)

    # per level/bucket maps
    ext_F_dst, ext_g_dst = [], []
    sep_gather, front_scatter = [], []
    F_gather, g_gather = [], []
    x_size = plan.n * d + d  # + trash block
    x_trash = plan.n * d

    for lv in plan.levels:
        eF, eg, sg, fs, Fg, gg = [], [], [], [], [], []
        for bk in lv:
            B = len(bk.cliques)
            fd, sd = bk.nf * d, bk.ns * d
            m = fd + sd
            # frontal gather indices
            Fi = bk.base[:, None] + np.arange(m * m, dtype=np.int64)[None, :]
            Fg.append(Fi.reshape(B, m, m))
            gi = bk.vec_base[:, None] + np.arange(m, dtype=np.int64)[None, :]
            gg.append(gi)
            # extend-add destinations + separator gathers + frontal scatters
            U_dst = np.full((B, sd, sd), trash_F, dtype=np.int64)
            ug_dst = np.full((B, sd), trash_g, dtype=np.int64)
            s_gat = np.full((B, sd), x_trash, dtype=np.int64)
            f_sca = np.full((B, fd), x_trash, dtype=np.int64)
            for i, cid in enumerate(bk.cliques):
                c = plan.cliques[cid]
                if c.parent >= 0:
                    p = plan.cliques[c.parent]
                    pm = (p.bucket[0] + p.bucket[1]) * d
                    pb = base[p.cid]
                    pvb = vec_base[p.cid]
                    ppos = np.array(
                        [clique_pos(p, v) * d for v in c.separator], dtype=np.int64
                    )
                    ns_real = len(c.separator)
                    rowp = (ppos[:, None] + ar[None, :]).reshape(-1)  # [ns_real*d]
                    U_dst[i, : ns_real * d, : ns_real * d] = (
                        pb + rowp[:, None] * pm + rowp[None, :]
                    )
                    ug_dst[i, : ns_real * d] = pvb + rowp
                # separator solution gather (positions in x_flat, permuted order)
                for si, v in enumerate(c.separator):
                    s_gat[i, si * d : (si + 1) * d] = v * d + ar
                for fi, v in enumerate(c.frontal):
                    f_sca[i, fi * d : (fi + 1) * d] = v * d + ar
            eF.append(U_dst)
            eg.append(ug_dst)
            sg.append(s_gat)
            fs.append(f_sca)
        ext_F_dst.append(eF)
        ext_g_dst.append(eg)
        sep_gather.append(sg)
        front_scatter.append(fs)
        F_gather.append(Fg)
        g_gather.append(gg)

    return NumericMaps(
        plan=plan,
        fac_F_idx=fac_F_idx,
        fac_g_idx=fac_g_idx,
        slot_rows=slot_rows,
        pad_diag_idx=pad_diag_idx,
        var_diag_idx=var_diag,
        ext_F_dst=ext_F_dst,
        ext_g_dst=ext_g_dst,
        sep_gather=sep_gather,
        front_scatter=front_scatter,
        F_gather=F_gather,
        g_gather=g_gather,
        x_size=x_size,
    )


def multifrontal_solve(
    maps: NumericMaps,
    Ab,
    lam=0.0,
    diagonal_damping: bool = False,
):
    """Solve (J^T J + lam D) x = J^T b via the planned supernodal Cholesky.

    Ab: tuple over factor batches of (A_blocks tuple, b) — the arrays of a
    LinearizedGraph (kept as a plain pytree so this function jits cleanly).
    Returns x as [n, d] mapped back to original variable rows.
    """
    plan = maps.plan
    d = plan.d
    dtype = Ab[0][1].dtype
    lam = jnp.asarray(lam, dtype=dtype)

    F = jnp.zeros((plan.F_size,), dtype=dtype)
    gv = jnp.zeros((plan.g_size,), dtype=dtype)

    # factor Hessian-block scatter (the Scatter/updateHessian analog,
    # HessianFactor.cpp:515)
    for (bi, k, l, idx) in maps.fac_F_idx:
        A, b = Ab[bi]
        blk = jnp.einsum("ndi,ndj->nij", A[k], A[l])
        F = F.at[jnp.asarray(idx)].add(blk)
    for (bi, k, idx) in maps.fac_g_idx:
        A, b = Ab[bi]
        F_k = jnp.einsum("ndk,nd->nk", A[k], b)
        gv = gv.at[jnp.asarray(idx)].add(F_k)

    # padding identity + damping
    F = F.at[jnp.asarray(maps.pad_diag_idx)].add(1.0)
    diag_idx = jnp.asarray(maps.var_diag_idx.reshape(-1))
    if diagonal_damping:
        # diag(H) per variable from the Jacobian blocks (H's diagonal is
        # distributed across cliques in F, so compute it directly)
        hdiag = jnp.zeros((plan.n, d), dtype=dtype)
        for (bi, k, rows) in maps.slot_rows:
            A, _b = Ab[bi]
            hdiag = hdiag.at[jnp.asarray(rows)].add(jnp.einsum("ndi,ndi->ni", A[k], A[k]))
        hdiag_perm = hdiag[jnp.asarray(plan.perm)].reshape(-1)
        F = F.at[diag_idx].add(lam * hdiag_perm)
    else:
        F = F.at[diag_idx].add(lam)

    # bottom-up elimination: per level, per bucket, one batched partial chol
    outs: List[List[Tuple]] = []
    for li, lv in enumerate(plan.levels):
        louts = []
        for bi, bk in enumerate(lv):
            fd, sd = bk.nf * d, bk.ns * d
            Fi = jnp.asarray(maps.F_gather[li][bi])
            gi = jnp.asarray(maps.g_gather[li][bi])
            Fm = F[Fi]  # [B, m, m]
            gm = gv[gi]  # [B, m]
            F11 = Fm[:, :fd, :fd]
            L11 = jnp.linalg.cholesky(F11)
            y = jax.scipy.linalg.solve_triangular(L11, gm[:, :fd, None], lower=True)[
                ..., 0
            ]
            if sd > 0:
                F12 = Fm[:, :fd, fd:]
                W = jax.scipy.linalg.solve_triangular(L11, F12, lower=True)
                U = Fm[:, fd:, fd:] - jnp.einsum("bkf,bkg->bfg", W, W)
                ug = gm[:, fd:] - jnp.einsum("bkf,bk->bf", W, y)
                F = F.at[jnp.asarray(maps.ext_F_dst[li][bi])].add(U)
                gv = gv.at[jnp.asarray(maps.ext_g_dst[li][bi])].add(ug)
            else:
                W = None
            louts.append((L11, W, y))
        outs.append(louts)

    # top-down back-substitution (linearAlgorithms-inst.h:35 optimizeBayesTree)
    x = jnp.zeros((maps.x_size,), dtype=dtype)
    for li in range(len(plan.levels) - 1, -1, -1):
        for bi, bk in enumerate(plan.levels[li]):
            L11, W, y = outs[li][bi]
            if W is not None:
                xs = x[jnp.asarray(maps.sep_gather[li][bi])]  # [B, sd]
                rhs = y - jnp.einsum("bfs,bs->bf", W, xs)
            else:
                rhs = y
            xf = jax.scipy.linalg.solve_triangular(
                L11, rhs[..., None], lower=True, trans=1
            )[..., 0]
            x = x.at[jnp.asarray(maps.front_scatter[li][bi])].set(xf)

    # permuted x -> original variable rows
    xp = x[: plan.n * d].reshape(plan.n, d)
    return xp[jnp.asarray(plan.iperm)]


# ---------------------------------------------------------------------------
# optimizer integration
# ---------------------------------------------------------------------------

_PLAN_CACHE: Dict = {}


def solve_linearized(graph, values, lam, diagonal_damping=False, cache=None):
    """Optimizer hook (solver="multifrontal"): linearize once per outer
    iteration (cached), then damped supernodal solves per lambda try."""
    types = values.types()
    if len(types) != 1:
        raise NotImplementedError(
            "multifrontal v1 supports one uniform variable type; "
            "use Schur pre-elimination for mixed-dim problems"
        )
    t = types[0]
    d = manifold.get(t).dim
    cache = cache if cache is not None else {}

    if cache.get("mf_lg") is None:
        cache["mf_lg"] = graph.linearize(values)
    lg = cache["mf_lg"]

    key = id(graph)
    ent = _PLAN_CACHE.get(key)
    if ent is None:
        n = lg.type_counts[t]
        plan = build_plan_for_graph(
            [(lb.rows, t) for lb in lg.batches], n, d
        )
        maps = build_numeric_maps(plan, lg)
        fn = jax.jit(
            partial(multifrontal_solve, maps), static_argnames=("diagonal_damping",)
        )
        _PLAN_CACHE[key] = (plan, maps, fn)
        ent = _PLAN_CACHE[key]
    plan, maps, fn = ent

    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x = fn(Ab, lam, diagonal_damping=diagonal_damping)
    delta = {t: x}

    # linearized cost decrease for LM rho
    from gtsam_petercdev_tpu.linear import solve as linsolve

    g = linsolve.gradient(lg)
    Hd = linsolve.hvp(lg, delta)
    lin_dec = sum(jnp.vdot(g[tt], delta[tt]) for tt in delta) - 0.5 * sum(
        jnp.vdot(delta[tt], Hd[tt]) for tt in delta
    )
    return delta, lin_dec
