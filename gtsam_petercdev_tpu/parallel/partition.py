"""Partitioned multi-device solve: nested-dissection separator Schur.

The reference's only decomposition of a SLAM graph into submaps is the
TSAM2-era METIS partitioning in gtsam_unstable/partition/
(FindSeparator.h:41 vertex separators, NestedDissection.h:21); it was never
wired to a distributed solver. This module supplies the TPU-native version
(SURVEY §5.7/§5.8): the map is split into P interior regions separated by a
global vertex separator S; each device eliminates its interior with the same
batched partial-Cholesky kernels as the single-chip engine; the Schur
complements onto S are `psum`-reduced over the mesh (ICI); the dense
separator system is solved replicated; back-substitution runs in parallel
per device.

SPMD trick: per-part elimination plans differ, but the eliminate kernel only
depends on a PADDED level signature (level count, per-level clique count and
shape). All parts are padded to the elementwise max signature, and every
index map (factor scatter, extend-add, separator redirect, back-substitution
gathers) becomes per-device DATA inside one shard_map body — one program,
P different trees. This is the same argument-indexed-kernel design the
incremental engine uses for its no-recompile guarantee.

Math per part p (uniform padded block dim d):
  H = [H_II  H_IS; H_SI  H_SS_p]  (interior I_p, separator scope S_p ⊆ S)
  interior multifrontal elimination ⇒ Schur U_p = H_SS_p − H_SI H_II⁻¹ H_IS
  Σ_p U_p (psum) ⇒ dense S system ⇒ x_S (replicated)
  back-substitution with x_S seeded ⇒ x_I_p  (device-local)
Factors whose variables all lie in S are scattered straight into the
separator system (on their owning device only).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gtsam_petercdev_tpu.inference import kernels
from gtsam_petercdev_tpu.inference.kernels import _einsum
from gtsam_petercdev_tpu.inference.symbolic import (
    colamd_ordering,
    symbolic_eliminate,
)


def _pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


# ---------------------------------------------------------------------------
# graph partitioning (host)
# ---------------------------------------------------------------------------


def partition_vars(
    n: int, edges: np.ndarray, n_parts: int
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Recursive BFS-bisection vertex partitioning.

    Returns (interiors, separator): `interiors` is a list of n_parts arrays
    of variable ids with NO edge between two different interiors; every
    crossing path goes through `separator`. The analog of the reference's
    METIS FindSeparator (gtsam_unstable/partition/FindSeparator.h:41).
    """
    import scipy.sparse as sp
    from scipy.sparse import csgraph

    if n_parts <= 1 or n <= n_parts:
        return [np.arange(n, dtype=np.int64)], np.zeros(0, dtype=np.int64)
    i = np.concatenate([edges[:, 0], edges[:, 1]])
    j = np.concatenate([edges[:, 1], edges[:, 0]])
    A = sp.csr_matrix((np.ones(len(i)), (i, j)), shape=(n, n))
    A.sum_duplicates()

    sep_all: List[np.ndarray] = []

    def bisect(nodes: np.ndarray):
        """-> (half_a, half_b, sep) with sep ⊂ half_a's side."""
        sub = A[nodes][:, nodes]
        nsub = len(nodes)
        ncomp, labels = csgraph.connected_components(sub, directed=False)
        if ncomp > 1:
            # split by components (balanced-ish)
            ca = labels == labels[0]
            return nodes[ca], nodes[~ca], np.zeros(0, dtype=np.int64)
        d0 = csgraph.breadth_first_order(
            sub, 0, directed=False, return_predecessors=False
        )
        far = d0[-1]
        dist = csgraph.dijkstra(sub, directed=False, unweighted=True, indices=far)
        med = np.median(dist)
        maskA = dist <= med
        if maskA.all() or not maskA.any():
            half = nsub // 2
            sortd = np.argsort(dist, kind="stable")
            maskA = np.zeros(nsub, dtype=bool)
            maskA[sortd[:half]] = True
        B_ind = np.where(~maskA)[0]
        nbrs_of_B = np.unique(sub[B_ind].indices)
        sep_mask = np.zeros(nsub, dtype=bool)
        sep_mask[nbrs_of_B] = True
        sep_mask &= maskA
        a_mask = maskA & ~sep_mask
        return nodes[a_mask], nodes[~maskA], nodes[sep_mask]

    parts: List[np.ndarray] = [np.arange(n, dtype=np.int64)]
    while len(parts) < n_parts:
        # split the largest part
        parts.sort(key=len, reverse=True)
        nodes = parts.pop(0)
        a, b, s = bisect(nodes)
        if len(s):
            sep_all.append(s)
        if len(a) == 0 or len(b) == 0:
            # could not split further: re-insert and stop
            parts.insert(0, np.concatenate([a, b]))
            break
        parts.append(a)
        parts.append(b)
    while len(parts) < n_parts:
        parts.append(np.zeros(0, dtype=np.int64))
    sep = (
        np.unique(np.concatenate(sep_all))
        if sep_all
        else np.zeros(0, dtype=np.int64)
    )
    return parts[:n_parts], sep


# ---------------------------------------------------------------------------
# plan structures
# ---------------------------------------------------------------------------


@dataclass
class PartitionedPlan:
    n: int
    d: int
    S: int  # separator var count
    n_parts: int
    sep_gids: np.ndarray  # [S] global var id per separator slot
    int_gids: List[np.ndarray]  # per part, interior gids in local-var order
    levels: List[Tuple[int, int, int]]  # unified (B, nf, ns) per level
    pool_size: int
    g_size: int
    m_max: int  # padded local-var count (x_perm length)
    # stacked per-part device maps (leading axis P)
    batch_maps: List[Dict[str, np.ndarray]]
    eye_rows: np.ndarray  # [P, E] pool rows
    eye_vals: np.ndarray  # [P, E, d*d]
    damp_rows: np.ndarray  # [P, V] pool rows of interior var diag blocks
    lvl_ext: List[Dict[str, np.ndarray]]  # per level stacked ext/sep/back maps
    sep_seed_pos: np.ndarray  # [P, Sp] x_perm positions of local sep vars
    sep_seed_sid: np.ndarray  # [P, Sp] global separator slot (trash S)
    int_out_pos: List[np.ndarray]  # per part [n_int_p] x_perm position of gid
    sep_fake_diag: np.ndarray  # [S*d] 1.0 where dim padding needs pinning
    sep_real_diag: np.ndarray  # [S*d] 1.0 on real dims (damping)


def _graph_edges(structure) -> np.ndarray:
    edge_list = []
    for ent in structure:
        keys = ent["keys"]
        K = keys.shape[1]
        for a in range(K):
            for b in range(a + 1, K):
                edge_list.append(np.stack([keys[:, a], keys[:, b]], axis=1))
    if not edge_list:
        return np.zeros((0, 2), np.int64)
    return np.concatenate(edge_list, axis=0)


def build_partitioned_plan(
    structure: Sequence[Dict],
    n: int,
    d: int,
    n_parts: int,
    var_dims: Optional[np.ndarray] = None,
) -> PartitionedPlan:
    """structure: per factor batch {'keys': [N, K] int64 gids, 'dims': tuple}.

    Builds the partition, the per-part interior elimination plans, unifies
    their padded signatures, and stacks every index map with a leading
    [n_parts] axis ready for shard_map.
    """
    if var_dims is None:
        var_dims = np.full(n, d, dtype=np.int64)
    edges = _graph_edges(structure)
    interiors, sep = partition_vars(n, edges, n_parts)
    while len(interiors) < n_parts:  # tiny graphs: some parts stay empty
        interiors.append(np.zeros(0, dtype=np.int64))
    S = len(sep)
    sid = np.full(n, -1, dtype=np.int64)
    sid[sep] = np.arange(S)
    part_of = np.full(n, -1, dtype=np.int64)
    for p, ints in enumerate(interiors):
        part_of[ints] = p

    # --- assign factors: any interior var fixes the part; all-sep -> owner 0
    fac_part: List[np.ndarray] = []
    for ent in structure:
        keys = ent["keys"]
        pk = part_of[keys]  # [N, K], -1 for sep vars
        fp = pk.max(axis=1)  # interior part (or -1 if pure-sep)
        # separator property: all interior vars of one factor share a part
        assert np.all((pk < 0) | (pk == fp[:, None])), (
            "factor spans two interiors — not a vertex separator"
        )
        fac_part.append(fp)

    # --- per-part local problems -----------------------------------------
    per_part = []
    for p in range(n_parts):
        ints = interiors[p]
        # local sep scope: sep vars appearing in this part's factors
        scope = set()
        for ent, fp in zip(structure, fac_part):
            rows = np.where(fp == p)[0]
            if len(rows):
                ks = ent["keys"][rows]
                scope.update(int(v) for v in ks.reshape(-1) if part_of[v] < 0)
        sep_local = np.asarray(sorted(scope), dtype=np.int64)
        local = np.concatenate([ints, sep_local])
        lid = np.full(n, -1, dtype=np.int64)
        lid[local] = np.arange(len(local))
        n_int = len(ints)
        fvars = []
        rowsets = []
        for ent, fp in zip(structure, fac_part):
            rows = np.where(fp == p)[0]
            rowsets.append(rows)
            if len(rows):
                fvars.append(lid[ent["keys"][rows]])
        m_local = len(local)
        if n_int == 0:
            per_part.append(
                dict(local=local, lid=lid, n_int=0, plan=None,
                     rowsets=rowsets, sep_local=sep_local)
            )
            continue
        base = colamd_ordering(m_local, _local_edges(fvars, m_local))
        sep_set = set(range(n_int, m_local))
        order = np.asarray(
            [v for v in base if v not in sep_set]
            + list(range(n_int, m_local)),
            dtype=np.int64,
        )
        plan = symbolic_eliminate(
            m_local, fvars if fvars else [np.zeros((0, 1), np.int64)], d,
            ordering=order, max_buckets_per_level=1,
            no_merge_across=sep_set, pad_fn=_pow2,
        )
        per_part.append(
            dict(local=local, lid=lid, n_int=n_int, plan=plan,
                 rowsets=rowsets, sep_local=sep_local)
        )

    # --- unify level signatures across parts ------------------------------
    # keep only interior cliques (frontal positions < n_int); their levels
    part_levels: List[List] = []  # per part: list of lists of cliques
    for pp in per_part:
        plan = pp["plan"]
        if plan is None:
            part_levels.append([])
            continue
        n_int = pp["n_int"]
        lvls: Dict[int, List] = {}
        for c in plan.cliques:
            if c.frontal[0] < n_int:  # pure by the merge barrier
                assert all(v < n_int for v in c.frontal)
                lvls.setdefault(c.level, []).append(c)
        # compress level ids preserving order
        part_levels.append([lvls[k] for k in sorted(lvls)])
    L = max((len(pl) for pl in part_levels), default=1)
    L = max(L, 1)
    levels: List[Tuple[int, int, int]] = []
    for li in range(L):
        B = nf = 1
        ns = 0
        for pl in part_levels:
            if li < len(pl):
                cl = pl[li]
                B = max(B, _pow2(len(cl)))
                nf = max(nf, max(c.bucket[0] for c in cl))
                ns = max(ns, max(c.bucket[1] for c in cl))
        levels.append((B, nf, ns))

    # pool layout (shared across parts)
    pool_off, g_off = [], []
    boff = goff = 0
    for (B, nf, ns) in levels:
        mb = nf + ns
        pool_off.append(boff)
        g_off.append(goff)
        boff += B * mb * mb
        goff += B * mb
    pool_size, g_size = boff, goff
    trash_blk, trash_g = pool_size, g_size
    m_max = _pow2(max(max(len(pp["local"]) for pp in per_part), 1))
    x_trash = m_max
    sep_trash_blk = S * S  # flat sep pool trash row
    sep_trash_g = S

    dd = d * d
    eye_flat = np.eye(d).reshape(-1)

    # --- per-part layout: assign cliques to level slots, positions --------
    part_meta = []
    for p, pp in enumerate(per_part):
        plan = pp["plan"]
        meta = dict(
            blk_base={}, g_base={}, mb_of={}, cpos={}, lvl_cl=[],
        )
        if plan is not None:
            for c in plan.cliques:
                c._fpos = {v: i for i, v in enumerate(c.frontal)}
                c._spos = {v: i for i, v in enumerate(c.separator)}
        for li, cl in enumerate(part_levels[p]):
            B, nf, ns = levels[li]
            mb = nf + ns
            for i, c in enumerate(cl):
                meta["blk_base"][c.cid] = pool_off[li] + i * mb * mb
                meta["g_base"][c.cid] = g_off[li] + i * mb
                meta["mb_of"][c.cid] = mb
                meta["nf_of"] = meta.get("nf_of", {})
                meta["nf_of"][c.cid] = nf
            meta["lvl_cl"].append(cl)
        part_meta.append(meta)

    def cpos(meta, c, pv):
        fp = c._fpos.get(pv)
        if fp is not None:
            return fp
        return meta["nf_of"][c.cid] + c._spos[pv]

    # --- factor scatter maps (pool + sep), stacked -------------------------
    batch_maps = []
    for bi, ent in enumerate(structure):
        keys = ent["keys"]
        K = keys.shape[1]
        n_sep_rows = int(np.sum(fac_part[bi] < 0))
        Nb = max(
            max((len(pp["rowsets"][bi]) for pp in per_part), default=0),
            # part 0 carries its own rows PLUS the pure-separator factors
            len(per_part[0]["rowsets"][bi]) + n_sep_rows,
        )
        Nb = _pow2(max(1, Nb))
        rows_m = np.zeros((n_parts, Nb), dtype=np.int32)
        mask_m = np.zeros((n_parts, Nb), dtype=np.float64)
        blkp = np.full((n_parts, Nb, K, K), trash_blk, dtype=np.int32)
        gixp = np.full((n_parts, Nb, K), trash_g, dtype=np.int32)
        blks = np.full((n_parts, Nb, K, K), sep_trash_blk, dtype=np.int32)
        gixs = np.full((n_parts, Nb, K), sep_trash_g, dtype=np.int32)
        for p, pp in enumerate(per_part):
            rows = pp["rowsets"][bi]
            plan = pp["plan"]
            lid = pp["lid"]
            take = list(rows)
            # pure-sep factors ride on part 0
            if p == 0:
                sep_rows = np.where(fac_part[bi] < 0)[0]
            else:
                sep_rows = np.zeros(0, dtype=np.int64)
            nr = len(take)
            nsr = len(sep_rows)
            rows_m[p, :nr] = take
            rows_m[p, nr : nr + nsr] = sep_rows
            mask_m[p, : nr + nsr] = 1.0
            if nr and plan is not None:
                meta = part_meta[p]
                lids = lid[keys[rows]]
                pvs = plan.iperm[lids]
                own = plan.var_clique[pvs.min(axis=1)]
                for i in range(nr):
                    c = plan.cliques[own[i]]
                    bb = meta["blk_base"][c.cid]
                    gb = meta["g_base"][c.cid]
                    mb = meta["mb_of"][c.cid]
                    pos = [cpos(meta, c, pvs[i, k]) for k in range(K)]
                    for k in range(K):
                        gixp[p, i, k] = gb + pos[k]
                        for l in range(K):
                            blkp[p, i, k, l] = bb + pos[k] * mb + pos[l]
            for i, r in enumerate(sep_rows):
                ss = sid[keys[r]]
                for k in range(K):
                    gixs[p, nr + i, k] = ss[k]
                    for l in range(K):
                        blks[p, nr + i, k, l] = ss[k] * S + ss[l]
        batch_maps.append(
            dict(rows=rows_m, mask=mask_m, blk_pool=blkp, gix_pool=gixp,
                 blk_sep=blks, gix_sep=gixs, K=K, Nb=Nb)
        )

    # --- eye padding + damping rows ---------------------------------------
    eye_rows_l, eye_vals_l, damp_rows_l = [], [], []
    for p, pp in enumerate(per_part):
        plan, meta = pp["plan"], part_meta[p]
        er, ev, dr = [], [], []
        used = np.zeros(len(levels), dtype=np.int64)
        for li, cl in enumerate(part_levels[p]):
            used[li] = len(cl)
        for li, (B, nf, ns) in enumerate(levels):
            mb = nf + ns
            for i in range(int(used[li]), B):
                for j in range(nf):
                    er.append(pool_off[li] + i * mb * mb + j * mb + j)
                    ev.append(eye_flat)
        if plan is not None:
            local = pp["local"]
            for li, cl in enumerate(part_levels[p]):
                B, nf, ns = levels[li]
                mb = nf + ns
                for i, c in enumerate(cl):
                    bb = meta["blk_base"][c.cid]
                    for fi in range(len(c.frontal), nf):
                        er.append(bb + fi * mb + fi)
                        ev.append(eye_flat)
                    for fi, pv in enumerate(c.frontal):
                        dr.append(bb + fi * mb + fi)
                        dv = int(var_dims[local[plan.perm[pv]]])
                        if dv < d:
                            v = np.zeros((d, d))
                            v[np.arange(dv, d), np.arange(dv, d)] = 1.0
                            er.append(bb + fi * mb + fi)
                            ev.append(v.reshape(-1))
        eye_rows_l.append(er)
        eye_vals_l.append(ev)
        damp_rows_l.append(dr)
    E = _pow2(max(max(len(e) for e in eye_rows_l), 1))
    V = _pow2(max(max(len(r) for r in damp_rows_l), 1))
    eye_rows = np.full((n_parts, E), trash_blk, dtype=np.int32)
    eye_vals = np.zeros((n_parts, E, dd))
    damp_rows = np.full((n_parts, V), trash_blk, dtype=np.int32)
    for p in range(n_parts):
        er, ev, dr = eye_rows_l[p], eye_vals_l[p], damp_rows_l[p]
        if er:
            eye_rows[p, : len(er)] = er
            eye_vals[p, : len(er)] = np.stack(ev)
        if dr:
            damp_rows[p, : len(dr)] = dr

    # --- per-level extend-add / sep-redirect / back-substitution maps -----
    lvl_ext = []
    for li, (B, nf, ns) in enumerate(levels):
        ext = np.full((n_parts, B, ns, ns), trash_blk, dtype=np.int32)
        extg = np.full((n_parts, B, ns), trash_g, dtype=np.int32)
        sext = np.full((n_parts, B, ns, ns), sep_trash_blk, dtype=np.int32)
        sextg = np.full((n_parts, B, ns), sep_trash_g, dtype=np.int32)
        sidx = np.full((n_parts, B, ns), x_trash, dtype=np.int32)
        fidx = np.full((n_parts, B, nf), x_trash, dtype=np.int32)
        for p, pp in enumerate(per_part):
            plan, meta = pp["plan"], part_meta[p]
            if plan is None or li >= len(part_levels[p]):
                continue
            n_int = pp["n_int"]
            local = pp["local"]
            for i, c in enumerate(part_levels[p][li]):
                for fi, pv in enumerate(c.frontal):
                    fidx[p, i, fi] = pv
                for si, pv in enumerate(c.separator):
                    sidx[p, i, si] = pv
                if not c.separator:
                    continue
                # parent = clique owning min separator position
                ppv = min(c.separator)
                if ppv < n_int:
                    pc = plan.cliques[plan.var_clique[ppv]]
                    bb = meta["blk_base"][pc.cid]
                    gb = meta["g_base"][pc.cid]
                    mb = meta["mb_of"][pc.cid]
                    ppos = [cpos(meta, pc, v) for v in c.separator]
                    for a, pa in enumerate(ppos):
                        extg[p, i, a] = gb + pa
                        for b2, pb in enumerate(ppos):
                            ext[p, i, a, b2] = bb + pa * mb + pb
                else:
                    # parent dropped (separator clique): redirect to the
                    # global separator system
                    ssl = [
                        int(sid[local[plan.perm[v]]]) for v in c.separator
                    ]
                    for a, sa in enumerate(ssl):
                        sextg[p, i, a] = sa
                        for b2, sb in enumerate(ssl):
                            sext[p, i, a, b2] = sa * S + sb
        lvl_ext.append(
            dict(ext=ext, extg=extg, sext=sext, sextg=sextg,
                 sep=sidx, fro=fidx)
        )

    # --- separator seeding + interior output maps -------------------------
    Sp = _pow2(max(max(len(pp["sep_local"]) for pp in per_part), 1))
    sep_seed_pos = np.full((n_parts, Sp), x_trash, dtype=np.int32)
    sep_seed_sid = np.full((n_parts, Sp), S, dtype=np.int32)
    int_out_pos = []
    int_gids = []
    for p, pp in enumerate(per_part):
        plan = pp["plan"]
        n_int = pp["n_int"]
        local = pp["local"]
        if plan is not None:
            for i, sv in enumerate(pp["sep_local"]):
                sep_seed_pos[p, i] = plan.iperm[pp["lid"][sv]]
                sep_seed_sid[p, i] = sid[sv]
            int_out_pos.append(plan.iperm[np.arange(n_int)].astype(np.int64))
        else:
            int_out_pos.append(np.zeros(0, dtype=np.int64))
        int_gids.append(local[:n_int])

    sep_fake = np.zeros(S * d)
    sep_real = np.zeros(S * d)
    for s, gv in enumerate(sep):
        dv = int(var_dims[gv])
        sep_real[s * d : s * d + dv] = 1.0
        if dv < d:
            sep_fake[s * d + dv : (s + 1) * d] = 1.0

    return PartitionedPlan(
        n=n, d=d, S=S, n_parts=n_parts,
        sep_gids=sep, int_gids=int_gids,
        levels=levels, pool_size=pool_size, g_size=g_size, m_max=m_max,
        batch_maps=batch_maps,
        eye_rows=eye_rows, eye_vals=eye_vals, damp_rows=damp_rows,
        lvl_ext=lvl_ext,
        sep_seed_pos=sep_seed_pos, sep_seed_sid=sep_seed_sid,
        int_out_pos=int_out_pos,
        sep_fake_diag=sep_fake, sep_real_diag=sep_real,
    )


def _local_edges(fvars: List[np.ndarray], m: int) -> np.ndarray:
    edge_list = []
    for fv in fvars:
        K = fv.shape[1]
        for a in range(K):
            for b in range(a + 1, K):
                edge_list.append(np.stack([fv[:, a], fv[:, b]], axis=1))
    if not edge_list:
        return np.zeros((0, 2), np.int64)
    return np.concatenate(edge_list, axis=0)


# ---------------------------------------------------------------------------
# the distributed solver
# ---------------------------------------------------------------------------


class PartitionedSolver:
    """Jitted SPMD solver over a device mesh for one problem structure.

    solve(Ab, lam) -> x [n, d] (host numpy): Ab is the same per-batch
    (A_blocks tuple, b) tuple the single-device multifrontal solver takes,
    in GLOBAL factor order; the solver gathers each device's shard.
    """

    def __init__(self, plan: PartitionedPlan, mesh: Mesh):
        self.plan = plan
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        assert mesh.devices.size == plan.n_parts
        self._jit = None

    def _build(self, dtype):
        plan = self.plan
        axis = self.axis
        mesh = self.mesh
        d = plan.d
        dd = d * d
        S = plan.S
        shard = NamedSharding(mesh, P(axis))

        dev_maps = []
        for bm in plan.batch_maps:
            dev_maps.append(
                tuple(
                    jax.device_put(jnp.asarray(bm[k]), shard)
                    for k in ("rows", "mask", "blk_pool", "gix_pool",
                              "blk_sep", "gix_sep")
                )
            )
        eye_rows = jax.device_put(jnp.asarray(plan.eye_rows), shard)
        eye_vals = jax.device_put(
            jnp.asarray(plan.eye_vals, dtype=dtype), shard
        )
        damp_rows = jax.device_put(jnp.asarray(plan.damp_rows), shard)
        lvl_args = []
        for le in plan.lvl_ext:
            lvl_args.append(
                tuple(
                    jax.device_put(jnp.asarray(le[k]), shard)
                    for k in ("ext", "extg", "sext", "sextg", "sep", "fro")
                )
            )
        seed_pos = jax.device_put(jnp.asarray(plan.sep_seed_pos), shard)
        seed_sid = jax.device_put(jnp.asarray(plan.sep_seed_sid), shard)
        sep_fake = jnp.asarray(plan.sep_fake_diag, dtype=dtype)
        sep_real = jnp.asarray(plan.sep_real_diag, dtype=dtype)

        levels = plan.levels
        pool_size, g_size = plan.pool_size, plan.g_size
        m_max = plan.m_max

        pool_off_static, g_off_static = [], []
        boff = goff = 0
        for (B, nf, ns) in levels:
            mb = nf + ns
            pool_off_static.append(boff)
            g_off_static.append(goff)
            boff += B * mb * mb
            goff += B * mb

        def body(Ab, lam, *shards):
            (maps, erow, eval_, drow, lvls, spos, ssid) = shards
            # leading axis 1 on every sharded map
            pool = jnp.zeros((pool_size + 1, dd), dtype=dtype)
            gp = jnp.zeros((g_size + 1, d), dtype=dtype)
            sep_pool = jnp.zeros((S * S + 1, dd), dtype=dtype)
            sep_g = jnp.zeros((S + 1, d), dtype=dtype)

            for (A, b), (rows, mask, blkp, gixp, blks, gixs) in zip(Ab, maps):
                rows, mask = rows[0], mask[0]
                blkp, gixp, blks, gixs = blkp[0], gixp[0], blks[0], gixs[0]
                # mask arrives as host f64; a mixed-dtype product would
                # promote the whole scatter chain and trip the f64->f32
                # scatter FutureWarning (hard error in future JAX)
                mask = mask.astype(b.dtype)
                Ag = tuple(Ak[rows] * mask[:, None, None] for Ak in A)
                bg = b[rows] * mask[:, None]
                K = len(Ag)
                Nb = bg.shape[0]
                for k in range(K):
                    gk = _einsum("nri,nr->ni", Ag[k], bg)
                    gk = jnp.pad(gk, ((0, 0), (0, d - gk.shape[-1])))
                    gp = gp.at[gixp[:, k]].add(gk)
                    sep_g = sep_g.at[gixs[:, k]].add(gk)
                    for l in range(K):
                        v = _einsum("nri,nrj->nij", Ag[k], Ag[l])
                        v = jnp.pad(
                            v,
                            ((0, 0), (0, d - v.shape[1]), (0, d - v.shape[2])),
                        ).reshape(Nb, dd)
                        pool = pool.at[blkp[:, k, l]].add(v)
                        sep_pool = sep_pool.at[blks[:, k, l]].add(v)
            pool = pool.at[erow[0]].add(eval_[0].astype(dtype))
            eye = jnp.eye(d, dtype=dtype).reshape(1, dd)
            pool = pool.at[drow[0]].add(lam * eye)

            # bottom-up interior elimination
            outs = []
            for li, (B, nf, ns) in enumerate(levels):
                mb = nf + ns
                m = mb * d
                (ext, extg, sext, sextg, sidx, fidx) = [a[0] for a in lvls[li]]
                blocks = pool[pool_off_static[li] : pool_off_static[li] + B * mb * mb]
                Fm = (
                    blocks.reshape(B, mb, mb, d, d)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(B, m, m)
                )
                gm = gp[g_off_static[li] : g_off_static[li] + B * mb].reshape(B, m)
                out = kernels.partial_cholesky(Fm, gm, nf, d)
                if ns > 0:
                    Ublk = (
                        out["U"]
                        .reshape(B, ns, d, ns, d)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(B * ns * ns, dd)
                    )
                    ugb = out["ug"].reshape(B * ns, d)
                    pool = pool.at[ext.reshape(-1)].add(Ublk)
                    gp = gp.at[extg.reshape(-1)].add(ugb)
                    sep_pool = sep_pool.at[sext.reshape(-1)].add(Ublk)
                    sep_g = sep_g.at[sextg.reshape(-1)].add(ugb)
                outs.append(out)

            # reduce + solve the separator system (replicated)
            sep_pool = jax.lax.psum(sep_pool, axis)
            sep_g = jax.lax.psum(sep_g, axis)
            if S > 0:
                Smat = (
                    sep_pool[:-1]
                    .reshape(S, S, d, d)
                    .transpose(0, 2, 1, 3)
                    .reshape(S * d, S * d)
                )
                Smat = Smat + jnp.diag(sep_fake + lam * sep_real)
                srhs = sep_g[:-1].reshape(S * d)
                cf = jax.scipy.linalg.cho_factor(Smat, lower=True)
                xS = jax.scipy.linalg.cho_solve(cf, srhs).reshape(S, d)
            else:
                xS = jnp.zeros((0, d), dtype=dtype)
            xS1 = jnp.concatenate([xS, jnp.zeros((1, d), dtype=dtype)], 0)

            # back-substitution: seed separator, then top-down interior
            x = jnp.zeros((m_max + 1, d), dtype=dtype)
            x = x.at[spos[0]].set(xS1[ssid[0]])
            for li in reversed(range(len(levels))):
                B, nf, ns = levels[li]
                (ext, extg, sext, sextg, sidx, fidx) = [a[0] for a in lvls[li]]
                out = outs[li]
                if ns > 0:
                    xs = x[sidx].reshape(B, ns * d)
                    rhs = out["y"] - _einsum("bfs,bs->bf", out["W"], xs)
                else:
                    rhs = out["y"]
                xf = kernels.backsolve_bucket(out["L"], out["Linv"], rhs, nf, d)
                x = x.at[fidx.reshape(-1)].set(xf.reshape(B * nf, d))
            return xS, x[None, :-1]  # xS replicated, x sharded

        def solver(Ab, lam):
            shards = (dev_maps, eye_rows, eye_vals, damp_rows, lvl_args,
                      seed_pos, seed_sid)
            specs = jax.tree_util.tree_map(lambda _: P(axis), shards)
            fn = shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    jax.tree_util.tree_map(lambda _: P(), Ab),
                    P(),
                    *specs,
                ),
                out_specs=(P(), P(axis)),
                # the partial-Cholesky fori_loop mixes device-varying data
                # with invariant zero-inits; skip the vma type check
                check_vma=False,
            )
            return fn(Ab, lam, *shards)

        return jax.jit(solver)

    def solve(self, Ab, lam=0.0):
        dtype = Ab[0][1].dtype
        if self._jit is None:
            self._jit = self._build(dtype)
        lam = jnp.asarray(lam, dtype=dtype)
        xS, x_parts = self._jit(tuple(Ab), lam)
        xS = np.asarray(xS)
        x_parts = np.asarray(x_parts)  # [P, m_max, d]
        plan = self.plan
        x = np.zeros((plan.n, plan.d))
        if plan.S:
            x[plan.sep_gids] = xS
        for p in range(plan.n_parts):
            gids = plan.int_gids[p]
            if len(gids):
                x[gids] = x_parts[p][plan.int_out_pos[p]]
        return x


# ---------------------------------------------------------------------------
# optimizer integration (solver="partitioned")
# ---------------------------------------------------------------------------

_PSOLVE_CACHE: Dict = {}


def clear_solver_cache():
    _PSOLVE_CACHE.clear()


def solve_linearized(graph, values, lam, cache=None, n_parts=None):
    """GN/LM linear-solve hook over the partitioned SPMD solver.

    Linearizes once per outer iteration (cached), builds the partitioned
    plan + mesh once per graph structure, and solves the damped system for
    each lambda trial (LM tryLambda retries flow through unchanged).
    Returns (delta dict, linearized cost decrease) like the other solvers.
    """
    from gtsam_petercdev_tpu.core import manifold
    from gtsam_petercdev_tpu.linear import solve as linsolve

    cache = cache if cache is not None else {}
    if cache.get("mf_lg") is None:
        cache["mf_lg"] = graph.linearize(values)
    lg = cache["mf_lg"]

    types = sorted(lg.type_counts)
    dims = {t: manifold.get(t).dim for t in types}
    d = max(dims.values())
    offs, off = {}, 0
    for t in types:
        offs[t] = off
        off += lg.type_counts[t]
    n = off

    if n_parts is None:
        n_parts = len(jax.devices())
    key = (id(graph), n_parts)
    ent = _PSOLVE_CACHE.get(key)
    if ent is None:
        structure = [
            {
                "keys": np.stack(
                    [np.asarray(r, np.int64) + offs[t]
                     for r, t in zip(lb.rows, lb.var_types)],
                    axis=1,
                ),
                "dims": tuple(dims[t] for t in lb.var_types),
            }
            for lb in lg.batches
        ]
        var_dims = np.full(n, d, dtype=np.int64)
        for t in types:
            var_dims[offs[t] : offs[t] + lg.type_counts[t]] = dims[t]
        plan = build_partitioned_plan(structure, n, d, n_parts,
                                      var_dims=var_dims)
        mesh = Mesh(np.array(jax.devices()[:n_parts]), ("parts",))
        ent = PartitionedSolver(plan, mesh)
        _PSOLVE_CACHE[key] = ent

    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x = ent.solve(Ab, lam)
    delta = {
        t: jnp.asarray(
            x[offs[t] : offs[t] + lg.type_counts[t], : dims[t]],
            dtype=lg.batches[0].b.dtype,
        )
        for t in types
    }
    g = linsolve.gradient(lg)
    Hd = linsolve.hvp(lg, delta)
    lin_dec = sum(jnp.vdot(g[t], delta[t]) for t in delta) - 0.5 * sum(
        jnp.vdot(delta[t], Hd[t]) for t in delta
    )
    return delta, lin_dec


# ---------------------------------------------------------------------------
# mixed-dim support: uniform sub-block splitting + FLOP accounting
# ---------------------------------------------------------------------------


def split_structure_to_blocks(
    structure: Sequence[Dict], var_dims: np.ndarray, d_sub: int
):
    """Re-express a mixed-dim problem on uniform d_sub blocks.

    The partitioned plan pads every variable block to one uniform d, so a
    Point3 inside a d=9 camera problem pays (9/3)^3 = 27x its native
    factorization FLOPs. Splitting each variable of dim dv into dv/d_sub
    consecutive sub-variables (a camera -> three d=3 blocks) removes that
    padding entirely while keeping the planner uniform — the TPU analog of
    the reference's variable-size Scatter blocks (gtsam/linear/Scatter.h:49).

    structure: per factor batch {'keys': [N, K] int64 gids, 'dims': tuple}.
    Returns (sub_structure, sub_base[n] int64, n_sub) where global sub-var
    id of (v, j) is sub_base[v] + j.
    """
    var_dims = np.asarray(var_dims, dtype=np.int64)
    assert np.all(var_dims % d_sub == 0), (var_dims.max(), d_sub)
    nb = var_dims // d_sub
    sub_base = np.concatenate([[0], np.cumsum(nb)[:-1]])
    n_sub = int(nb.sum())
    sub_structure = []
    for ent in structure:
        keys = ent["keys"]
        dims = ent["dims"]
        cols = []
        sdims = []
        for k, dv in enumerate(dims):
            for j in range(dv // d_sub):
                cols.append(sub_base[keys[:, k]] + j)
                sdims.append(d_sub)
        sub_structure.append(
            {"keys": np.stack(cols, axis=1), "dims": tuple(sdims)}
        )
    return sub_structure, sub_base, n_sub


def split_Ab_to_blocks(Ab, structure, d_sub: int):
    """Slice each factor batch's A blocks into d_sub-wide column blocks
    (same enumeration order as split_structure_to_blocks)."""
    out = []
    for (A, b), ent in zip(Ab, structure):
        blocks = []
        for k, dv in enumerate(ent["dims"]):
            for j in range(dv // d_sub):
                blocks.append(A[k][:, :, j * d_sub : (j + 1) * d_sub])
        out.append((tuple(blocks), b))
    return tuple(out)


def merge_block_solution(
    x_sub: np.ndarray, sub_base: np.ndarray, var_dims: np.ndarray, d_sub: int
) -> np.ndarray:
    """[n_sub, d_sub] sub-block solution -> [n, max_d] per-var layout."""
    var_dims = np.asarray(var_dims, dtype=np.int64)
    n = len(var_dims)
    x = np.zeros((n, int(var_dims.max())))
    for v in range(n):
        dv = int(var_dims[v])
        kb = dv // d_sub
        x[v, :dv] = x_sub[sub_base[v] : sub_base[v] + kb].reshape(-1)
    return x


def plan_padded_flops(plan: PartitionedPlan) -> Dict[str, float]:
    """Padded factorization FLOPs PER DEVICE of one partitioned solve,
    computed from the unified level signatures (every device executes the
    same padded program): per clique chol((nf*d)^3/3) + trsm + syrk, plus
    the replicated separator Cholesky. Reported so padding waste is a
    number, not a vibe (VERDICT r4)."""
    d = plan.d
    interior = 0.0
    for (B, nf, ns) in plan.levels:
        f = nf * d
        s = ns * d
        interior += B * (f**3 / 3.0 + f * f * s + f * s * s)
    sep = (plan.S * d) ** 3 / 3.0
    return {
        "interior_gflops_per_device": interior / 1e9,
        "separator_gflops_replicated": sep / 1e9,
    }
