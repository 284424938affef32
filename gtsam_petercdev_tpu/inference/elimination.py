"""Batched supernodal multifrontal Cholesky — device execution of an
EliminationPlan (block-pool design, v2).

Layout: every clique's (padded) frontal matrix is a row-major grid of
mb x mb blocks of d x d; all cliques' blocks live in ONE flat pool
[n_blocks, d*d] ordered level/bucket/clique-contiguously, so each bucket's
frontal matrices are a STATIC SLICE of the pool (no gather). The only
scatters are block-granular (d*d-wide rows):

  1. factor Hessian blocks  A_k^T A_l -> owning clique slots (the Scatter /
     updateHessian analog, gtsam/linear/HessianFactor.cpp:515),
  2. child->parent Schur extend-add (ClusterTree-inst.h:219-268).

Per level/bucket one hand-rolled batched partial-Cholesky kernel
(inference/kernels.py) replaces the reference's per-clique choleskyPartial
(base/cholesky.cpp:106-159). Back-substitution mirrors
GaussianConditional::solve (linear/GaussianConditional.cpp:218) as the
top-down level sweep.

Mixed-dimension support: variables of tangent dim < d are padded to d with
identity rows on the fake dims (so BA's Pose3+Point3 and VIO's
Pose3+Vel+Bias run the same uniform-shape kernels; the reference handles
this with variable-size blocks, Scatter.h:49).

v1 history: the first version kept scalar-granular index maps the size of
the whole frontal pool (~20M int64 entries embedded as XLA constants) which
made a single GN step compile in 250+ s and run scatter-bound; this design
keeps index maps ~1000x smaller and all heavy ops dense.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.inference.kernels import _einsum
from gtsam_petercdev_tpu.inference import kernels
from gtsam_petercdev_tpu.inference.symbolic import (
    Bucket,
    Clique,
    EliminationPlan,
    symbolic_eliminate,
)


@dataclass
class BatchStructure:
    """Host structure of one factor batch: per-slot global var ids."""

    dims: Tuple[int, ...]  # true tangent dim per slot (<= plan.d)
    gids: Tuple[np.ndarray, ...]  # per slot [N] global variable ids
    sign: float = 1.0


@dataclass
class GatherSumPlan:
    """Host-planned scatter-free segment sum: pool[t] = sum of the source
    rows whose destination is t, computed as (optional log-depth pairwise
    pre-reduce rounds) + <=C direct gathers. This replaces XLA scatter-add,
    which lowers to a SEQUENTIAL per-update loop on TPU (measured ~1 us per
    d*d block on sphere2500 — 31 ms assemble + 25 ms extend-add of a 64 ms
    GN step were pure scatter serialization; see PROFILE_r04.md)."""

    rounds: List[Tuple[np.ndarray, np.ndarray]]  # (ia, ib) over current src
    direct: np.ndarray  # [n_dest, C] rows into final src (last row = zero)
    n_src: int  # rows of the original source array


def build_gather_sum_plan(
    dest: np.ndarray, n_dest: int, n_src: int, max_direct: int = 4
) -> GatherSumPlan:
    """Plan pool[t] = sum_{s: dest[s]==t} src[s] as gathers.

    dest: [S] int destination ids (< n_dest) in source-row order. Rows with
    the same destination are pairwise-combined (log2 rounds) until every
    destination has <= max_direct contributing rows, then gathered directly.
    """
    dest = np.asarray(dest, dtype=np.int64)
    groups: Dict[int, List[int]] = {}
    for s, t in enumerate(dest):
        groups.setdefault(int(t), []).append(s)
    rounds: List[Tuple[np.ndarray, np.ndarray]] = []
    cur_len = len(dest)
    while groups and max(len(v) for v in groups.values()) > max_direct:
        ia, ib = [], []
        new_groups: Dict[int, List[int]] = {}
        for t, rows in groups.items():
            lst = new_groups.setdefault(t, [])
            for i in range(0, len(rows), 2):
                lst.append(len(ia))
                ia.append(rows[i])
                ib.append(rows[i + 1] if i + 1 < len(rows) else cur_len)
        rounds.append(
            (np.asarray(ia, dtype=np.int32), np.asarray(ib, dtype=np.int32))
        )
        groups = new_groups
        cur_len = len(ia)
    C = max(1, max((len(v) for v in groups.values()), default=1))
    direct = np.full((n_dest, C), cur_len, dtype=np.int32)  # trash = zero row
    for t, rows in groups.items():
        direct[t, : len(rows)] = rows
    return GatherSumPlan(rounds=rounds, direct=direct, n_src=n_src)


def apply_gather_sum(plan: GatherSumPlan, src):
    """Execute a GatherSumPlan on device. src [n_src, w] -> [n_dest, w]."""
    z = jnp.zeros((1, src.shape[1]), src.dtype)
    for ia, ib in plan.rounds:
        s = jnp.concatenate([src, z], axis=0)
        src = s[jnp.asarray(ia)] + s[jnp.asarray(ib)]
    s = jnp.concatenate([src, z], axis=0)
    out = s[jnp.asarray(plan.direct[:, 0])]
    for c in range(1, plan.direct.shape[1]):
        out = out + s[jnp.asarray(plan.direct[:, c])]
    return out


@dataclass
class BucketMaps:
    level: int
    B: int
    nf: int  # padded frontal blocks
    ns: int  # padded separator blocks
    blk_start: int  # first pool row of this bucket's blocks
    g_start: int  # first g-pool row
    sep_idx: np.ndarray  # [B, ns] x-pool rows of separator vars (trash pads)
    fro_idx: np.ndarray  # [B, nf] x-pool rows of frontal vars (trash pads)
    u_base: int = 0  # first row of this bucket's U blocks in the U pool
    ug_base: int = 0  # first row of this bucket's ug rows in the ug pool
    # pull-model extend-add: this bucket's frontal blocks GATHER the child
    # Schur contributions (ClusterTree-inst.h:219 extend-add, inverted so no
    # scatter runs on device). Each entry [B*mb*mb] (resp. [B*mb]) indexes
    # the U (resp. ug) pool; multiple gathers when a slot has several
    # contributing children. None when the bucket has no children.
    ext_pull: Optional[List[np.ndarray]] = None
    extg_pull: Optional[List[np.ndarray]] = None
    # matmul extend-add (the fast path used by the solve): child U matrices
    # are projected into parent frame via one-hot block-selection matmuls
    # (S^T U S on the MXU, where narrow-row gathers cost ~30ns/row) and
    # segment-summed per parent at whole-matrix row granularity.
    # groups: (child_bucket_flat_idx, sel [n_sel], ppos [n_sel, ns_child])
    ext_mm: Optional[List[Tuple[int, np.ndarray, np.ndarray]]] = None
    ext_seg: Optional[GatherSumPlan] = None  # parent segment sum over n_all

    @property
    def mb(self):
        return self.nf + self.ns


_MAPS_UID = [0]


@dataclass
class NumericMaps:
    plan: EliminationPlan
    n_blocks: int
    n_grows: int
    batch_signs: List[float]
    slot_dims: List[Tuple[int, ...]]
    slot_gids: List[Tuple[np.ndarray, ...]]  # per batch per slot [N] gids
    asm_plan: GatherSumPlan  # factor blocks + eye + damp -> block pool
    asm_g_plan: GatherSumPlan  # factor g rows -> g pool
    hdiag_plan: GatherSumPlan  # per-slot |col|^2 rows -> [n] Hessian diag
    eye_vals: np.ndarray  # [P, d*d] identity padding contribution values
    var_diag_rows: np.ndarray  # [n] pool row of var's diag block (gid order)
    n_ublocks: int  # rows of the U extend-add pool
    n_ugrows: int
    buckets: List[BucketMaps]  # flattened level-major, bottom-up
    uid: int = -1  # unique id for the jit cache


def build_plan_for_graph(
    lg_rows,
    n_vars: int,
    d: int,
    ordering: Optional[np.ndarray] = None,
    **kwargs,
) -> EliminationPlan:
    """lg_rows: list of (rows_tuple, _ignored) or BatchStructure entries."""
    factor_vars = []
    for ent in lg_rows:
        rows = ent.gids if isinstance(ent, BatchStructure) else ent[0]
        factor_vars.append(np.stack(rows, axis=1).astype(np.int64))
    return symbolic_eliminate(n_vars, factor_vars, d, ordering=ordering, **kwargs)


def type_offsets(type_counts: Dict[str, int]) -> Dict[str, int]:
    """Global variable enumeration: types in sorted-name order."""
    off, out = 0, {}
    for t in sorted(type_counts):
        out[t] = off
        off += type_counts[t]
    return out


def graph_structure(graph, values) -> List[BatchStructure]:
    """Host-only structure extraction (no device work)."""
    graph._materialize()
    counts = {t: values._count(t) for t in values.types()}
    offs = type_offsets(counts)
    out = []
    for batch in graph.batches:
        gids, dims = [], []
        for k, t in enumerate(batch.ftype.var_types):
            rows = values.rows(batch.keys[:, k], t)
            gids.append(np.asarray(rows, dtype=np.int64) + offs[t])
            dims.append(manifold.get(t).dim)
        out.append(BatchStructure(tuple(dims), tuple(gids), batch.sign))
    return out


def _as_structures(structure) -> List[BatchStructure]:
    if hasattr(structure, "batches"):  # LinearizedGraph (single-type tests)
        offs = type_offsets(structure.type_counts)
        ents = []
        for lb in structure.batches:
            dims = tuple(manifold.get(t).dim for t in lb.var_types)
            gids = tuple(
                np.asarray(r, dtype=np.int64) + offs[t]
                for r, t in zip(lb.rows, lb.var_types)
            )
            ents.append(BatchStructure(dims, gids, getattr(lb, "sign", 1.0)))
        return ents
    out = []
    for ent in structure:
        if isinstance(ent, BatchStructure):
            out.append(ent)
        else:  # legacy (var_types, rows) tuple, single type space
            var_types, rows = ent[0], ent[1]
            sign = ent[2] if len(ent) > 2 else 1.0
            dims = tuple(manifold.get(t).dim for t in var_types)
            gids = tuple(np.asarray(r, dtype=np.int64) for r in rows)
            out.append(BatchStructure(dims, gids, sign))
    return out


def build_numeric_maps(
    plan: EliminationPlan, structure, var_dims: Optional[np.ndarray] = None
) -> NumericMaps:
    """Build block-granular index maps binding factor structure to the plan.

    var_dims: [n] true tangent dim per global var (defaults to plan.d —
    uniform). Vars with dim < d get identity rows on their fake dims.
    """
    structure = _as_structures(structure)
    d = plan.d
    iperm = plan.iperm
    cliques = plan.cliques

    # clique block-pool bases (level/bucket/clique-contiguous)
    blk_base = np.zeros(len(cliques), dtype=np.int64)
    g_base = np.zeros(len(cliques), dtype=np.int64)
    mb_of = np.zeros(len(cliques), dtype=np.int64)
    boff, goff = 0, 0
    bucket_meta = []
    for lv_i, lv in enumerate(plan.levels):
        for bk in lv:
            mb = bk.nf + bk.ns
            bucket_meta.append((lv_i, bk, boff, goff))
            for cid in bk.cliques:
                blk_base[cid] = boff
                g_base[cid] = goff
                mb_of[cid] = mb
                boff += mb * mb
                goff += mb
    n_blocks, n_grows = boff, goff
    trash_blk, trash_g = n_blocks, n_grows

    for c in cliques:
        c._fpos = {v: i for i, v in enumerate(c.frontal)}
        c._spos = {v: i for i, v in enumerate(c.separator)}

    def cpos(c: Clique, pv: int) -> int:
        p = c._fpos.get(pv)
        if p is not None:
            return p
        return c.bucket[0] + c._spos[pv]

    # --- factor contribution destinations (block pool / g pool slots) ---
    # enumeration order MUST match assemble(): per batch, k-major then l for
    # blocks; per batch then k for g rows; then eye rows; then damp rows.
    blk_dest_parts: List[np.ndarray] = []
    g_dest_parts: List[np.ndarray] = []
    hdiag_dest_parts: List[np.ndarray] = []
    slot_gids, signs, sdims = [], [], []
    for ent in structure:
        K = len(ent.gids)
        gids = [np.asarray(g, dtype=np.int64) for g in ent.gids]
        N = gids[0].shape[0]
        pvs = [iperm[g] for g in gids]
        minpv = pvs[0]
        for k in range(1, K):
            minpv = np.minimum(minpv, pvs[k])
        own = plan.var_clique[minpv]  # [N]
        base = blk_base[own]
        gb = g_base[own]
        mb = mb_of[own]
        pos = np.empty((N, K), dtype=np.int64)
        for k in range(K):
            # vectorized clique_pos
            pos[:, k] = np.array(
                [cpos(cliques[own[i]], pvs[k][i]) for i in range(N)],
                dtype=np.int64,
            )
        for k in range(K):
            g_dest_parts.append(gb + pos[:, k])
            hdiag_dest_parts.append(gids[k])
            for l in range(K):
                blk_dest_parts.append(base + pos[:, k] * mb + pos[:, l])
        slot_gids.append(tuple(gids))
        signs.append(float(ent.sign))
        sdims.append(tuple(ent.dims))

    # --- identity padding: padded frontal slots + fake dims of small vars ---
    dd = d * d
    eye_rows, eye_vals = [], []
    eye_flat = np.eye(d).reshape(-1)
    if var_dims is None:
        var_dims = np.full(plan.n, d, dtype=np.int64)
    for c in cliques:
        nf_pad, _ = c.bucket
        mb = mb_of[c.cid]
        for i in range(len(c.frontal), nf_pad):
            eye_rows.append(blk_base[c.cid] + i * mb + i)
            eye_vals.append(eye_flat)
        for i, pv in enumerate(c.frontal):
            dv = int(var_dims[plan.perm[pv]])
            if dv < d:
                v = np.zeros((d, d))
                v[np.arange(dv, d), np.arange(dv, d)] = 1.0
                eye_rows.append(blk_base[c.cid] + i * mb + i)
                eye_vals.append(v.reshape(-1))
    eye_rows = np.asarray(eye_rows, dtype=np.int32)
    eye_vals = (
        np.stack(eye_vals).astype(np.float64)
        if eye_vals
        else np.zeros((0, dd))
    )

    # --- per-var diag block rows (gid order, for damping) ---
    var_diag = np.zeros(plan.n, dtype=np.int32)
    for c in cliques:
        mb = mb_of[c.cid]
        for i, pv in enumerate(c.frontal):
            var_diag[plan.perm[pv]] = blk_base[c.cid] + i * mb + i

    # --- assembly gather plans (block pool, g pool, Hessian diagonal) ---
    n_fac_blk = sum(p.shape[0] for p in blk_dest_parts)
    n_fac_g = sum(p.shape[0] for p in g_dest_parts)
    blk_dest = np.concatenate(
        blk_dest_parts + [eye_rows.astype(np.int64), var_diag.astype(np.int64)]
    )
    asm_plan = build_gather_sum_plan(
        blk_dest, n_blocks + 1, n_fac_blk + len(eye_rows) + plan.n
    )
    g_dest = (
        np.concatenate(g_dest_parts)
        if g_dest_parts
        else np.zeros(0, dtype=np.int64)
    )
    asm_g_plan = build_gather_sum_plan(g_dest, n_grows + 1, n_fac_g)
    hdiag_dest = (
        np.concatenate(hdiag_dest_parts)
        if hdiag_dest_parts
        else np.zeros(0, dtype=np.int64)
    )
    hdiag_plan = build_gather_sum_plan(hdiag_dest, plan.n, n_fac_g)

    # --- bucket maps: U/ug pool bases + pull-model extend-add gathers ---
    # child cid -> (u base row, ug base row, padded ns, flat bucket, local i)
    u_off, ug_off = 0, 0
    child_uinfo: Dict[int, Tuple[int, int, int, int, int]] = {}
    for bf_i, (lv_i, bk, boff_b, goff_b) in enumerate(bucket_meta):
        B, ns = len(bk.cliques), bk.ns
        for i, cid in enumerate(bk.cliques):
            child_uinfo[cid] = (u_off + i * ns * ns, ug_off + i * ns, ns, bf_i, i)
        u_off += B * ns * ns
        ug_off += B * ns
    n_ublocks, n_ugrows = u_off, ug_off

    # children lists (only cliques that push a real separator contribution)
    kids: List[List[int]] = [[] for _ in cliques]
    for c in cliques:
        if c.parent >= 0 and c.separator:
            kids[c.parent].append(c.cid)

    buckets = []
    x_trash = plan.n
    for (lv_i, bk, boff_b, goff_b) in bucket_meta:
        B = len(bk.cliques)
        nf, ns = bk.nf, bk.ns
        mb = nf + ns
        sep = np.full((B, ns), x_trash, dtype=np.int64)
        fro = np.full((B, nf), x_trash, dtype=np.int64)
        # pull extend-add: per parent slot, list of contributing child U rows
        slot_contrib: Dict[int, List[int]] = {}
        gslot_contrib: Dict[int, List[int]] = {}
        mm_groups: Dict[int, List[Tuple[int, int, np.ndarray]]] = {}
        for i, cid in enumerate(bk.cliques):
            c = cliques[cid]
            for si, v in enumerate(c.separator):
                sep[i, si] = v
            for fi, v in enumerate(c.frontal):
                fro[i, fi] = v
            for ch_cid in kids[cid]:
                ch = cliques[ch_cid]
                ub, ugb, ch_ns, ch_bf, ch_loc = child_uinfo[ch_cid]
                ppos = np.array(
                    [cpos(c, v) for v in ch.separator], dtype=np.int64
                )
                nr = len(ch.separator)
                pp = np.full(ch_ns, -1, dtype=np.int32)
                pp[:nr] = ppos
                mm_groups.setdefault(ch_bf, []).append((i, ch_loc, pp))
                for a in range(nr):
                    ga = i * mb + int(ppos[a])
                    gslot_contrib.setdefault(ga, []).append(ugb + a)
                    for b_ in range(nr):
                        slot = i * mb * mb + int(ppos[a]) * mb + int(ppos[b_])
                        slot_contrib.setdefault(slot, []).append(
                            ub + a * ch_ns + b_
                        )
        nkids = [len(kids[cid]) for cid in bk.cliques]
        ext_pull = _pull_layers(slot_contrib, nkids, mb * mb, n_ublocks)
        extg_pull = _pull_layers(gslot_contrib, nkids, mb, n_ugrows)
        # matmul extend-add groups (parent-segment order = concat of groups
        # in ascending child-bucket order)
        ext_mm, parent_ids = [], []
        for ch_bf in sorted(mm_groups):
            ents = mm_groups[ch_bf]
            sel = np.asarray([e[1] for e in ents], dtype=np.int32)
            pp = np.stack([e[2] for e in ents], axis=0)
            ext_mm.append((ch_bf, sel, pp))
            parent_ids.extend(e[0] for e in ents)
        ext_seg = (
            build_gather_sum_plan(
                np.asarray(parent_ids, dtype=np.int64), B, len(parent_ids),
                max_direct=2,
            )
            if parent_ids
            else None
        )
        buckets.append(
            BucketMaps(
                level=lv_i,
                B=B,
                nf=nf,
                ns=ns,
                blk_start=boff_b,
                g_start=goff_b,
                sep_idx=sep.astype(np.int32),
                fro_idx=fro.astype(np.int32),
                u_base=child_uinfo[bk.cliques[0]][0],
                ug_base=child_uinfo[bk.cliques[0]][1],
                ext_pull=ext_pull,
                extg_pull=extg_pull,
                ext_mm=ext_mm or None,
                ext_seg=ext_seg,
            )
        )

    _MAPS_UID[0] += 1
    return NumericMaps(
        plan=plan,
        n_blocks=n_blocks,
        n_grows=n_grows,
        batch_signs=signs,
        slot_dims=sdims,
        slot_gids=slot_gids,
        asm_plan=asm_plan,
        asm_g_plan=asm_g_plan,
        hdiag_plan=hdiag_plan,
        eye_vals=eye_vals,
        var_diag_rows=var_diag,
        n_ublocks=n_ublocks,
        n_ugrows=n_ugrows,
        buckets=buckets,
        uid=_MAPS_UID[0],
    )


def _pull_layers(
    contrib: Dict[int, List[int]],
    nkids: List[int],
    slots_per_clique: int,
    trash: int,
) -> Optional[List[np.ndarray]]:
    """Turn slot -> [source rows] into multiplicity-layer gather arrays.

    A slot's contribution count is bounded by its clique's child count, and
    the symbolic planner sorts each bucket's cliques by DESCENDING child
    count, so layer c only needs to cover the prefix of cliques with more
    than c children — each returned array is [B_prefix * slots_per_clique]
    (trash row for absent contributions), cutting gather volume ~2x vs
    full-bucket layers on sphere2500."""
    if not contrib:
        return None
    C = max(len(v) for v in contrib.values())
    out = []
    for c in range(C):
        B_pref = sum(1 for k in nkids if k > c)
        out.append(np.full(B_pref * slots_per_clique, trash, dtype=np.int32))
    for slot, rows in contrib.items():
        for c, r in enumerate(rows):
            assert slot < out[c].shape[0], "bucket not sorted by child count"
            out[c][slot] = r
    return out


def _pad_last(x, target):
    pad = target - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


def assemble(maps: NumericMaps, Ab, lam, diagonal_damping: bool):
    """Gather factor Hessian blocks + identity padding + damping into the
    block pool — entirely scatter-free (see GatherSumPlan).

    Returns (pool [n_blocks+1, d*d], gp [n_grows+1, d])."""
    plan = maps.plan
    d = plan.d
    dd = d * d
    dtype = Ab[0][1].dtype
    lam = jnp.asarray(lam, dtype=dtype)
    n = plan.n

    # contribution rows in the exact order the host plans enumerate
    blk_rows, g_rows, hdiag_rows = [], [], []
    for bi, (A, b) in enumerate(Ab):
        K = len(A)
        sign = maps.batch_signs[bi]
        N = b.shape[0]
        for k in range(K):
            gk = _einsum("nri,nr->ni", A[k], b)
            hk = _einsum("nri,nri->ni", A[k], A[k])
            if sign != 1.0:
                gk = gk * sign
                hk = hk * sign
            g_rows.append(_pad_last(gk, d))
            hdiag_rows.append(_pad_last(hk, d))
            for l in range(K):
                blk = _einsum("nri,nrj->nij", A[k], A[l])
                if sign != 1.0:
                    blk = blk * sign
                blk = _pad_last(
                    jnp.pad(blk, ((0, 0), (0, d - blk.shape[1]), (0, 0))), d
                )
                blk_rows.append(blk.reshape(N, dd))

    # damping contribution per variable (targets its diag slot)
    eye = jnp.eye(d, dtype=dtype).reshape(1, dd)
    if diagonal_damping:
        hdiag = apply_gather_sum(
            maps.hdiag_plan, jnp.concatenate(hdiag_rows, axis=0)
        )
        damp = (
            lam * hdiag[:, :, None] * jnp.eye(d, dtype=dtype)[None]
        ).reshape(n, dd)
    else:
        damp = jnp.broadcast_to(lam * eye, (n, dd))

    contrib = jnp.concatenate(
        blk_rows + [jnp.asarray(maps.eye_vals, dtype=dtype), damp], axis=0
    )
    pool = apply_gather_sum(maps.asm_plan, contrib)
    gp = apply_gather_sum(maps.asm_g_plan, jnp.concatenate(g_rows, axis=0))
    return pool, gp


def _pull_ext(pool_slice, U_pool, ext_pull):
    """Add pulled child contributions to a bucket's flat block slice.

    Each multiplicity layer covers only a PREFIX of the slab (cliques
    sorted by child count), so higher layers stay cheap."""
    if ext_pull is None:
        return pool_slice
    out = pool_slice
    for idx in ext_pull:
        npre = idx.shape[0]
        add = U_pool[jnp.asarray(idx)]
        if npre == out.shape[0]:
            out = out + add
        else:
            out = jnp.concatenate([out[:npre] + add, out[npre:]], axis=0)
    return out


def _use_pallas() -> bool:
    """Pallas v2 elimination kernel: DEFAULT on TPU (GTSAM_TPU_PALLAS=0
    opts out).

    v2 (ops/cholesky_v2.py) runs each level bucket as a batch-chunked
    Mosaic grid — the whole chunk of cliques lives in VMEM and the block
    column loop is fused into one program, replacing the ~30 dependent
    1-5 µs HLOs per column that dominated the r4 profile (PROFILE_r04.md).
    The r3/r4 v1 kernel (one grid program per clique, ops/cholesky.py)
    measured slower than XLA and is retired. Buckets whose single-clique
    VMEM working set exceeds the budget fall back to the XLA kernel."""
    import os

    env = os.environ.get("GTSAM_TPU_PALLAS", "1")
    if env == "0":
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _multifrontal_solve_impl(
    maps: NumericMaps,
    Ab,
    lam=0.0,
    diagonal_damping: bool = False,
    return_stats: bool = False,
    return_logdet: bool = False,
):
    plan = maps.plan
    d = plan.d
    dd = d * d
    dtype = Ab[0][1].dtype
    with jax.named_scope("assemble"):
        pool, gp = assemble(maps, Ab, lam, diagonal_damping)
    use_pallas = _use_pallas()
    if use_pallas:
        from gtsam_petercdev_tpu.ops import cholesky_v2 as pallas_bs

    # bottom-up: per bucket one batched partial Cholesky; each bucket pulls
    # its children's Schur contributions by projecting the child U matrices
    # into the parent frame with one-hot block-selection matmuls (MXU) and
    # a per-parent segment sum at whole-matrix row granularity — no scatter
    # and no narrow-row gathers (ClusterTree-inst.h:219 extend-add analog)
    outs = []
    bad_total = jnp.zeros((), jnp.int32)
    logdet = jnp.zeros((), dtype=dtype)
    eye_d = jnp.eye(d, dtype=dtype)
    for bi_, bm in enumerate(maps.buckets):
        B, nf, ns, mb = bm.B, bm.nf, bm.ns, bm.mb
        m = mb * d
        with jax.named_scope(f"pull{bi_}_B{B}nf{nf}ns{ns}"):
            blocks = pool[bm.blk_start : bm.blk_start + B * mb * mb]
            Fm = (
                blocks.reshape(B, mb, mb, d, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, m, m)
            )
            gm = gp[bm.g_start : bm.g_start + B * mb].reshape(B, m)
            if bm.ext_mm:
                incs, incgs = [], []
                for (ch_bf, sel, pp) in bm.ext_mm:
                    Us = outs[ch_bf]["U"][jnp.asarray(sel)]
                    ugs = outs[ch_bf]["ug"][jnp.asarray(sel)]
                    nsel, ns_c = pp.shape
                    # scalar selection matrix S6 = onehot(block) kron I_d
                    ohb = (
                        jnp.asarray(pp)[:, :, None]
                        == jnp.arange(mb, dtype=jnp.int32)[None, None, :]
                    ).astype(dtype)
                    S6 = (
                        ohb[:, :, None, :, None]
                        * eye_d[None, None, :, None, :]
                    ).reshape(nsel, ns_c * d, m)
                    T = _einsum("cxy,cxr->cry", Us, S6)
                    incs.append(
                        _einsum("cry,cys->crs", T, S6).reshape(nsel, m * m)
                    )
                    incgs.append(_einsum("cx,cxr->cr", ugs, S6))
                Fm = Fm + apply_gather_sum(
                    bm.ext_seg, jnp.concatenate(incs, axis=0)
                ).reshape(B, m, m)
                gm = gm + apply_gather_sum(
                    bm.ext_seg, jnp.concatenate(incgs, axis=0)
                )
        with jax.named_scope(f"chol{bi_}_B{B}nf{nf}ns{ns}"):
            if use_pallas:
                from gtsam_petercdev_tpu.ops import cholesky_v2 as pallas_chol

                if pallas_chol.fits_vmem(
                    B, nf, ns, d, jnp.dtype(dtype).itemsize
                ):
                    # whole-bucket Mosaic program(s): batch chunk in VMEM,
                    # fused block-column loop (replaces the fori_loop HLO
                    # chain of kernels.partial_cholesky)
                    out = pallas_chol.partial_cholesky(Fm, gm, nf, d)
                else:
                    out = kernels.partial_cholesky(Fm, gm, nf, d)
            else:
                out = kernels.partial_cholesky(Fm, gm, nf, d)
        bad_total = bad_total + out["bad"]
        if return_logdet:
            # padded cliques/slots carry identity pivots -> log 1 = 0
            dg = jnp.diagonal(out["L"], axis1=1, axis2=2)
            logdet = logdet + 2.0 * jnp.sum(jnp.log(jnp.maximum(dg, 1e-300)))
        outs.append(out)

    # top-down back-substitution
    with jax.named_scope("backsub"):
        x = jnp.zeros((plan.n + 1, d), dtype=dtype)
        for bm, out in zip(reversed(maps.buckets), reversed(outs)):
            B, nf, ns = bm.B, bm.nf, bm.ns
            if use_pallas and pallas_bs.backsolve_fits(
                B, nf, ns, d, jnp.dtype(dtype).itemsize
            ):
                # fused separator-subtract + blocked backsolve in VMEM
                if ns > 0:
                    xs = x[jnp.asarray(bm.sep_idx)].reshape(B, ns * d)
                else:
                    xs = jnp.zeros((B, 0), dtype=dtype)
                xf = pallas_bs.backsolve_bucket(
                    out["L"], out["Linv"], out["W"], out["y"], xs, nf, d
                )
            else:
                if ns > 0:
                    xs = x[jnp.asarray(bm.sep_idx)].reshape(B, ns * d)
                    rhs = out["y"] - _einsum("bfs,bs->bf", out["W"], xs)
                else:
                    rhs = out["y"]
                xf = kernels.backsolve_bucket(out["L"], out["Linv"], rhs, nf, d)
            x = x.at[jnp.asarray(bm.fro_idx.reshape(-1))].set(
                xf.reshape(B * nf, d)
            )

    # permuted rows -> global variable id order
    xp = x[:-1]
    xg = xp[jnp.asarray(plan.iperm)]
    if return_stats or return_logdet:
        stats = {"bad_pivots": bad_total}
        if return_logdet:
            stats["logdet"] = logdet
        return xg, stats
    return xg


def _var_g_rows(maps: NumericMaps) -> np.ndarray:
    """g-pool row of each variable's frontal slot, in gid order.

    maps.buckets is level-major in the same order as plan.levels, so the
    i-th clique of the i-th flattened plan bucket matches BucketMaps."""
    plan = maps.plan
    rows = np.zeros(plan.n, dtype=np.int32)
    flat = [bk for lv in plan.levels for bk in lv]
    for bm, bk in zip(maps.buckets, flat):
        for i, cid in enumerate(bk.cliques):
            c = plan.cliques[cid]
            gb = bm.g_start + i * bm.mb
            for fi, pv in enumerate(c.frontal):
                rows[plan.perm[pv]] = gb + fi
    return rows


def _factor_impl(maps: NumericMaps, Ab, lam=0.0):
    """Assemble + eliminate, returning the per-bucket factors (L, Linv, W)
    for repeated applies (the subgraph-preconditioner workhorse)."""
    pool, gp = assemble(maps, Ab, lam, False)
    outs = []
    d = maps.plan.d
    dd = d * d
    U_pool = jnp.zeros((maps.n_ublocks + 1, dd), dtype=pool.dtype)
    for bm in maps.buckets:
        B, nf, ns, mb = bm.B, bm.nf, bm.ns, bm.mb
        m = mb * d
        blocks = _pull_ext(
            pool[bm.blk_start : bm.blk_start + B * mb * mb], U_pool, bm.ext_pull
        )
        Fm = (
            blocks.reshape(B, mb, mb, d, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, m, m)
        )
        gm = jnp.zeros((B, m), dtype=Fm.dtype)
        out = kernels.partial_cholesky(Fm, gm, nf, d)
        if ns > 0:
            Ublk = (
                out["U"]
                .reshape(B, ns, d, ns, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B * ns * ns, dd)
            )
            U_pool = lax.dynamic_update_slice(U_pool, Ublk, (bm.u_base, 0))
        outs.append((out["L"], out["Linv"], out["W"]))
    return outs


def _apply_impl(maps: NumericMaps, var_g_rows, chol, r):
    """x = H^-1 r given the factor from _factor_impl. r: [n, d] gid order."""
    plan = maps.plan
    d = plan.d
    dtype = r.dtype
    gp = jnp.zeros((maps.n_grows + 1, d), dtype=dtype)
    gp = gp.at[jnp.asarray(var_g_rows)].set(_pad_last(r, d))
    ug_pool = jnp.zeros((maps.n_ugrows + 1, d), dtype=dtype)

    ys = []
    for bm, (L, Linv, W) in zip(maps.buckets, chol):
        B, nf, ns = bm.B, bm.nf, bm.ns
        gm = _pull_ext(
            gp[bm.g_start : bm.g_start + B * bm.mb], ug_pool, bm.extg_pull
        ).reshape(B, bm.mb * d)
        y = kernels.forward_solve_bucket(L, Linv, gm[:, : nf * d], nf, d)
        if ns > 0:
            ug = gm[:, nf * d :] - _einsum("bkf,bk->bf", W, y)
            ug_pool = lax.dynamic_update_slice(
                ug_pool, ug.reshape(B * ns, d), (bm.ug_base, 0)
            )
        ys.append(y)

    x = jnp.zeros((plan.n + 1, d), dtype=dtype)
    for bm, (L, Linv, W), y in zip(
        reversed(maps.buckets), reversed(chol), reversed(ys)
    ):
        B, nf, ns = bm.B, bm.nf, bm.ns
        if ns > 0:
            xs = x[jnp.asarray(bm.sep_idx)].reshape(B, ns * d)
            rhs = y - _einsum("bfs,bs->bf", W, xs)
        else:
            rhs = y
        xf = kernels.backsolve_bucket(L, Linv, rhs, nf, d)
        x = x.at[jnp.asarray(bm.fro_idx.reshape(-1))].set(
            xf.reshape(B * nf, d)
        )
    return x[:-1][jnp.asarray(plan.iperm)]


_FACTOR_JIT_CACHE: Dict[int, any] = {}
_APPLY_JIT_CACHE: Dict[int, any] = {}


def multifrontal_factor(maps: NumericMaps, Ab, lam=0.0):
    fn = _FACTOR_JIT_CACHE.get(maps.uid)
    if fn is None:
        fn = jax.jit(partial(_factor_impl, maps))
        _FACTOR_JIT_CACHE[maps.uid] = fn
    return fn(Ab, lam)


def multifrontal_apply(maps: NumericMaps, chol, r):
    ent = _APPLY_JIT_CACHE.get(maps.uid)
    if ent is None:
        rows = _var_g_rows(maps)
        fn = jax.jit(partial(_apply_impl, maps, rows))
        _APPLY_JIT_CACHE[maps.uid] = fn
        ent = fn
    return ent(chol, r)


_SOLVE_JIT_CACHE: Dict[int, any] = {}


def multifrontal_solve(
    maps: NumericMaps,
    Ab,
    lam=0.0,
    diagonal_damping: bool = False,
    return_stats: bool = False,
):
    """Solve (J^T J + lam D) x = J^T b via the planned supernodal Cholesky.

    Ab: tuple over factor batches of (A_blocks tuple, b). Returns x [n, d]
    in GLOBAL variable-id order (callers slice per type/dim); with
    return_stats=True returns (x, stats) where stats['bad_pivots'] counts
    clamped pivots (the IndeterminantLinearSystemException analog,
    gtsam/linear/linearExceptions.h).

    The implementation is jitted per plan (cached on maps.uid): eager
    execution would retrace the per-bucket fori_loop kernels on every call.
    """
    fn = _SOLVE_JIT_CACHE.get(maps.uid)
    if fn is None:
        fn = jax.jit(
            partial(_multifrontal_solve_impl, maps),
            static_argnames=("diagonal_damping", "return_stats"),
        )
        _SOLVE_JIT_CACHE[maps.uid] = fn
    return fn(
        Ab, lam, diagonal_damping=diagonal_damping, return_stats=return_stats
    )


# ---------------------------------------------------------------------------
# optimizer integration
# ---------------------------------------------------------------------------

_PLAN_CACHE: Dict = {}


def clear_plan_cache():
    _PLAN_CACHE.clear()


def solve_linearized(graph, values, lam, diagonal_damping=False, cache=None):
    """Optimizer hook (solver="multifrontal"): linearize once per outer
    iteration (cached), then damped supernodal solves per lambda try.

    Supports mixed variable types/dims: every variable gets a d_max-padded
    tangent block (fake dims pinned by identity), the delta is sliced back
    per type afterwards.
    """
    cache = cache if cache is not None else {}
    if cache.get("mf_lg") is None:
        cache["mf_lg"] = graph.linearize(values)
    lg = cache["mf_lg"]

    types = sorted(lg.type_counts)
    dims = {t: manifold.get(t).dim for t in types}
    d = max(dims.values())
    offs = type_offsets(lg.type_counts)
    n = sum(lg.type_counts.values())

    key = id(graph)
    ent = _PLAN_CACHE.get(key)
    if ent is None:
        structure = []
        for lb in lg.batches:
            gids = tuple(
                np.asarray(r, dtype=np.int64) + offs[t]
                for r, t in zip(lb.rows, lb.var_types)
            )
            structure.append(
                BatchStructure(
                    tuple(dims[t] for t in lb.var_types), gids, lb.sign
                )
            )
        plan = build_plan_for_graph(structure, n, d)
        var_dims = np.full(n, d, dtype=np.int64)
        for t in types:
            var_dims[offs[t] : offs[t] + lg.type_counts[t]] = dims[t]
        maps = build_numeric_maps(plan, structure, var_dims=var_dims)
        _PLAN_CACHE[key] = (plan, maps)
        ent = _PLAN_CACHE[key]
    plan, maps = ent

    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x, stats = multifrontal_solve(
        maps, Ab, lam, diagonal_damping=diagonal_damping, return_stats=True
    )
    # surface clamped-pivot count so LM can reject indefinite (H + lam D)
    # trials (LevenbergMarquardtOptimizer.cpp:155-160 catches the
    # IndeterminantLinearSystemException and retries with larger lambda)
    cache["bad_pivots"] = stats["bad_pivots"]
    delta = {t: x[offs[t] : offs[t] + lg.type_counts[t], : dims[t]] for t in types}

    # linearized cost decrease for LM rho
    from gtsam_petercdev_tpu.linear import solve as linsolve

    g = linsolve.gradient(lg)
    Hd = linsolve.hvp(lg, delta)
    lin_dec = sum(jnp.vdot(g[tt], delta[tt]) for tt in delta) - 0.5 * sum(
        jnp.vdot(delta[tt], Hd[tt]) for tt in delta
    )
    return delta, lin_dec


def plan_flop_stats(plan, var_dims=None):
    """Padded vs native factorization FLOPs of one multifrontal sweep.

    Padded: every clique executes at its bucket's (nf_pad, ns_pad) * d
    shape (what the device actually runs). Native: the clique's true
    frontal/separator dims under var_dims (what the reference's
    variable-size blocks would run, gtsam/linear/Scatter.h:49). The ratio
    is the shape-class + dim-padding waste — reported by bench.py so
    "padding rides the MXU" is falsifiable (VERDICT r4).
    """
    d = plan.d
    if var_dims is None:
        var_dims = np.full(plan.n, d, dtype=np.int64)

    def _flops(f, s):
        return f**3 / 3.0 + f * f * s + f * s * s

    padded = native = 0.0
    for lv in plan.levels:
        for bk in lv:
            fpad, spad = bk.nf * d, bk.ns * d
            padded += len(bk.cliques) * _flops(fpad, spad)
            for cid in bk.cliques:
                c = plan.cliques[cid]
                ft = float(sum(var_dims[plan.perm[pv]] for pv in c.frontal))
                st = float(
                    sum(var_dims[plan.perm[pv]] for pv in c.separator)
                )
                native += _flops(ft, st)
    return {
        "padded_gflops": padded / 1e9,
        "native_gflops": native / 1e9,
        "padding_waste_pct": round(100.0 * (1.0 - native / padded), 1)
        if padded
        else 0.0,
    }
