"""Incremental supernodal elimination — the TPU-native Bayes tree.

Reference: gtsam/nonlinear/ISAM2.cpp:117-363 (recalculate),
inference/BayesTree-inst.h:464-501 (removeTop / orphan surgery),
ISAM2Clique.{h,cpp} (cached separator factors, wildfire back-substitution).

Design (the incremental analog of inference/elimination.py's batch engine):

* The Bayes tree lives as HOST records (CliqueRec: frontal/separator gids,
  parent/children, owned factor rows) plus DEVICE pools: for each clique
  shape class (nf, ns) one set of arrays L/Linv/W/y/U/ug with a free-list.
  A clique's numeric payload is one row of its class pool. U/ug is the
  cached separator factor (the message passed to the parent — exactly
  ISAM2Clique::cachedFactor_).

* update(marked, relin, new...) does the reference's removeTop: affected
  cliques = ancestor closure of cliques containing marked keys (frontal
  occurrence for new-factor keys, full containment-subtree for relinearized
  keys, matching UpdateImpl fluid marking). Children of affected cliques
  that are not themselves affected become ORPHANS; their cached (U, ug)
  re-enter the local elimination as dense Hessian "message" factors
  (BayesTreeOrphanWrapper / GetCachedBoundaryFactors, ISAM2.cpp:286-300).

* The local problem (owned factors of affected cliques + orphan messages +
  new factors) is eliminated by the same batched partial-Cholesky kernels
  as the batch engine — but ALL index maps are passed as runtime ARGUMENTS,
  so the jitted executable depends only on a padded shape signature
  (bucket/level/factor-count classes). Repeated update shapes (the common
  odometry step) hit the jit cache: NO recompilation in steady state.

* Back-substitution is "wildfire" (ISAM2Clique.cpp:237): a host-driven
  frontier descent from the re-eliminated cliques, batched per shape class
  per round, that stops descending into subtrees whose separator delta
  changed less than the threshold. threshold=0 descends fully (exact).

* Variables never move: gid = insertion order; the delta lives in one
  device array x[gid] that grows by doubling.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Dict, List, NamedTuple, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.inference import kernels, kernels_np
from gtsam_petercdev_tpu.inference.kernels import _einsum


def _np_pad_last(x, target):
    pad = target - x.shape[-1]
    if pad <= 0:
        return x
    return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])


class _NpAccum:
    """Scatter-add into a [R, W] array. With the native library the adds
    run IMMEDIATELY through scatter_add_rows (one C call per contribution,
    ~free); otherwise contributions queue and materialize via ONE
    np.bincount pass at flush (np.add.at costs ~0.5 ms per call regardless
    of size). Bind `dst`/`trash_row` at construction to enable the
    immediate path."""

    def __init__(self, W, dst=None, trash_row=None):
        self.W = W
        self.rows = []
        self.vals = []
        self.dst = None
        self.trash = -1 if trash_row is None else int(trash_row)
        self.lib = None
        if dst is not None and dst.dtype == np.float64:
            from gtsam_petercdev_tpu.inference.kernels_np import _native_lib

            lib = _native_lib()
            if lib is not None:
                self.dst = dst
                self.lib = lib

    def add(self, rows, vals):
        if self.lib is not None:
            import ctypes

            rows = np.ascontiguousarray(
                np.asarray(rows, dtype=np.int64).ravel()
            )
            vals = np.ascontiguousarray(vals, dtype=np.float64)
            cp = lambda a: ctypes.c_void_p(a.ctypes.data)
            self.lib.scatter_add_rows(
                cp(self.dst), cp(rows), cp(vals), rows.size, self.W,
                self.trash,
            )
            return
        self.rows.append(np.asarray(rows, dtype=np.int64).ravel())
        self.vals.append(np.ascontiguousarray(vals).reshape(-1, self.W))

    def flush_into(self, dst, trash_row=None):
        """dst[r] += sum of queued vals for r. Entries with row == trash_row
        are dropped, then ONE bincount covers only the [min, max] window of
        real destinations (a loop-closure level's extend-add touches a
        narrow band of the pool; windowing keeps the pass O(entries+band)
        instead of O(pool) per level)."""
        if not self.rows:
            return
        W = self.W
        rows = np.concatenate(self.rows) if len(self.rows) > 1 else self.rows[0]
        vals = (
            np.concatenate(self.vals, axis=0)
            if len(self.vals) > 1
            else self.vals[0]
        )
        self.rows.clear()
        self.vals.clear()
        if trash_row is not None:
            keep = rows != trash_row
            if not keep.all():
                rows = rows[keep]
                vals = vals[keep]
        if rows.size == 0:
            return
        if dst.dtype == np.float64:
            from gtsam_petercdev_tpu.inference.kernels_np import _native_lib

            lib = _native_lib()
            if lib is not None:
                import ctypes

                vals = np.ascontiguousarray(vals, dtype=np.float64)
                rows = np.ascontiguousarray(rows, dtype=np.int64)
                cp = lambda a: ctypes.c_void_p(a.ctypes.data)
                lib.scatter_add_rows(
                    cp(dst), cp(rows), cp(vals), rows.size, W, -1
                )
                return
        lo = int(rows.min())
        hi = int(rows.max())
        if rows.size <= 128:
            np.add.at(dst, rows, vals)
            return
        lin = ((rows - lo)[:, None] * W + np.arange(W)).ravel()
        acc = np.bincount(lin, weights=vals.ravel(), minlength=(hi - lo + 1) * W)
        flat = dst.reshape(-1)
        flat[lo * W : (hi + 1) * W] += acc.astype(dst.dtype, copy=False)
from gtsam_petercdev_tpu.inference.symbolic import (
    ccolamd_ordering,
    symbolic_eliminate,
)

def _pad(x: int) -> int:
    """Pad counts to powers of two: the incremental path's jit signatures are
    built from padded sizes, so coarse classes keep the number of distinct
    XLA compiles small (compile time dominates wall-clock otherwise)."""
    p = 1
    while p < x:
        p *= 2
    return p


def _pad_class(x: int) -> int:
    """Clique shape classes (nf/ns blocks), also power-of-two."""
    return _pad(x)


_B_CHUNK = 64


def _b_class(x: int) -> int:
    """Batch-size classes for the level/wildfire/scatter kernels: {1,4,16,64}.

    Much coarser than pow2 and CAPPED at _B_CHUNK — larger batches run as
    several chunked calls of the same compiled executable. The batch axis was
    the main driver of jit-signature explosion on City10000 loop closures
    (8 pow2 values x 39 (nf,ns) classes x capacity values = hundreds of XLA
    compiles); with 4 values it saturates within the first closures."""
    for c in (1, 4, 16, _B_CHUNK):
        if x <= c:
            return c
    return _B_CHUNK


# ---------------------------------------------------------------------------
# device pools
# ---------------------------------------------------------------------------


class PoolArrays(NamedTuple):
    """One shape class's clique payloads; row `cap` is the zero trash row."""

    L: jnp.ndarray  # [cap+1, fd, fd]
    Linv: jnp.ndarray  # [cap+1, nf, d, d]
    W: jnp.ndarray  # [cap+1, fd, sd]
    y: jnp.ndarray  # [cap+1, fd]
    U: jnp.ndarray  # [cap+1, sd, sd]
    ug: jnp.ndarray  # [cap+1, sd]


@dataclass
class PoolClass:
    nf: int
    ns: int
    cap: int
    arrays: PoolArrays
    free: List[int] = field(default_factory=list)
    top: int = 0

    def alloc(self) -> int:
        if self.free:
            return self.free.pop()
        if self.top >= self.cap:
            return -1  # caller grows
        r = self.top
        self.top += 1
        return r


@lru_cache(maxsize=None)
def _make_pool_jit(nf, ns, d, cap, dtype_str):
    """Fused allocation of one class's zeroed payload arrays (eager jnp.zeros
    was ~13ms per array on the City10000 hot path)."""

    def f(probe):
        fd, sd = nf * d, ns * d
        z = lambda *s: jnp.zeros(s, dtype=probe.dtype)
        return PoolArrays(
            L=z(cap + 1, fd, fd),
            Linv=z(cap + 1, nf, d, d),
            W=z(cap + 1, fd, sd),
            y=z(cap + 1, fd),
            U=z(cap + 1, sd, sd),
            ug=z(cap + 1, sd),
        )

    return jax.jit(f)


def _make_pool(nf, ns, d, cap, dtype, as_numpy: bool = False) -> PoolArrays:
    if as_numpy:
        fd, sd = nf * d, ns * d
        dt = np.dtype(str(jnp.dtype(dtype)))
        z = lambda *s: np.zeros(s, dtype=dt)
        return PoolArrays(
            L=z(cap + 1, fd, fd),
            Linv=z(cap + 1, nf, d, d),
            W=z(cap + 1, fd, sd),
            y=z(cap + 1, fd),
            U=z(cap + 1, sd, sd),
            ug=z(cap + 1, sd),
        )
    probe = jnp.zeros((), dtype=dtype)
    return _make_pool_jit(nf, ns, d, cap, str(dtype))(probe)


@lru_cache(maxsize=None)
def _grow_pool_jit(nf, ns, d, old_cap, new_cap, dtype_str):
    def f(old: PoolArrays):
        fd, sd = nf * d, ns * d
        z = lambda *s: jnp.zeros(s, dtype=old.L.dtype)
        return PoolArrays(
            L=z(new_cap + 1, fd, fd).at[:old_cap].set(old.L[:old_cap]),
            Linv=z(new_cap + 1, nf, d, d).at[:old_cap].set(old.Linv[:old_cap]),
            W=z(new_cap + 1, fd, sd).at[:old_cap].set(old.W[:old_cap]),
            y=z(new_cap + 1, fd).at[:old_cap].set(old.y[:old_cap]),
            U=z(new_cap + 1, sd, sd).at[:old_cap].set(old.U[:old_cap]),
            ug=z(new_cap + 1, sd).at[:old_cap].set(old.ug[:old_cap]),
        )

    # no donation: outputs are larger than the donated inputs (XLA cannot
    # reuse the buffers and warns on every growth event)
    return jax.jit(f)


def _grow_pool(p: PoolClass, d, dtype, as_numpy: bool = False) -> PoolClass:
    # pool-class capacity feeds the wildfire/scatter jit signatures, so every
    # growth event recompiles all (B, nf, ns) kernels of the class: start at
    # a generous floor and grow 16x so a 10k-step run sees at most one growth
    # (numpy backend: shapes are free, grow 4x from a small floor)
    if as_numpy:
        new_cap = max(2, p.cap * 2)
        na = _make_pool(p.nf, p.ns, d, new_cap, dtype, as_numpy=True)
        for dst, src in zip(na, p.arrays):
            dst[: p.cap] = src[: p.cap]
        return PoolClass(p.nf, p.ns, new_cap, na, p.free, p.top)
    if p.nf + p.ns <= 8:
        new_cap = max(4096, p.cap * 16)
    else:
        new_cap = max(256, p.cap * 16)
    na = _grow_pool_jit(p.nf, p.ns, d, p.cap, new_cap, str(dtype))(p.arrays)
    return PoolClass(p.nf, p.ns, new_cap, na, p.free, p.top)


# ---------------------------------------------------------------------------
# host records
# ---------------------------------------------------------------------------


class _BucketChunk(NamedTuple):
    """A <=_B_CHUNK slice of one level bucket (same (nf, ns) class)."""

    nf: int
    ns: int
    cliques: Tuple


@dataclass
class CliqueRec:
    cid: int
    cls: Tuple[int, int]  # (nf, ns) pool class
    row: int  # pool row
    frontal: List[int]  # gids, elimination order
    separator: List[int]  # gids, local-plan position order
    parent: int = -1  # cid
    children: Set[int] = field(default_factory=set)
    owned_fac: List[Tuple[int, int]] = field(default_factory=list)  # (grp,row)
    owned_msg: List[int] = field(default_factory=list)  # persistent msg ids
    alive: bool = True
    nslot: int = -1  # native-tree slot (numpy backend)


class _NativeTree:
    """Flat per-slot topology/payload descriptor tables for the native
    wildfire sweep (native/src/solve_native.cpp). Slots are recycled via a
    free list so the table size tracks PEAK LIVE cliques, not the
    append-only cid space. Payload addresses stay valid because the numpy
    payload arrays are owned by engine.payloads until the clique dies."""

    def __init__(self, lib, d: int):
        self.lib = lib
        self.d = d
        cap = 1024
        self.cap = cap
        self.parent = np.full(cap, -1, dtype=np.int32)
        self.alive = np.zeros(cap, dtype=np.uint8)
        self.nf = np.zeros(cap, dtype=np.int32)
        self.ns = np.zeros(cap, dtype=np.int32)
        self.nfr = np.zeros(cap, dtype=np.int32)  # real counts (<= class)
        self.nsr = np.zeros(cap, dtype=np.int32)
        self.pL = np.zeros(cap, dtype=np.uint64)
        self.pLinv = np.zeros(cap, dtype=np.uint64)
        self.pW = np.zeros(cap, dtype=np.uint64)
        self.pY = np.zeros(cap, dtype=np.uint64)
        self.fro_off = np.zeros(cap, dtype=np.int64)
        self.sep_off = np.zeros(cap, dtype=np.int64)
        self.free: List[int] = []
        self.top = 0
        self.buf_cap = 65536
        self.fro_buf = np.zeros(self.buf_cap, dtype=np.int32)
        self.sep_buf = np.zeros(self.buf_cap, dtype=np.int32)
        self.cursor = 0  # shared cursor for both gid buffers
        self.live_ints = 0  # gid entries owned by live slots
        self.max_fd = d
        self.seed_mask = np.zeros(cap, dtype=np.uint8)
        self.scratch = np.zeros(4 * self.max_fd, dtype=np.float64)

    def _grow_slots(self):
        new = self.cap * 2
        for name in ("parent", "alive", "nf", "ns", "nfr", "nsr", "pL",
                     "pLinv", "pW", "pY", "fro_off", "sep_off", "seed_mask"):
            old = getattr(self, name)
            arr = np.zeros(new, dtype=old.dtype)
            if name == "parent":
                arr[:] = -1
            arr[: self.cap] = old
            setattr(self, name, arr)
        self.cap = new

    def _buf_reserve(self, n: int):
        need = self.cursor + n
        if need <= self.buf_cap:
            return
        while self.buf_cap < need:
            self.buf_cap *= 2
        for name in ("fro_buf", "sep_buf"):
            old = getattr(self, name)
            arr = np.zeros(self.buf_cap, dtype=np.int32)
            arr[: self.cursor] = old[: self.cursor]
            setattr(self, name, arr)

    def alloc(self, rec: "CliqueRec", pay: PoolArrays) -> int:
        nf, ns = rec.cls
        nfr, nsr = len(rec.frontal), len(rec.separator)
        if self.free:
            s = self.free.pop()
        else:
            if self.top >= self.cap:
                self._grow_slots()
            s = self.top
            self.top += 1
        width = max(nfr, nsr)
        self._buf_reserve(width)
        off = self.cursor
        self.fro_buf[off : off + nfr] = rec.frontal
        self.sep_buf[off : off + nsr] = rec.separator
        self.cursor += width
        self.live_ints += width
        self.parent[s] = -1
        self.alive[s] = 1
        self.nf[s] = nf
        self.ns[s] = ns
        self.nfr[s] = nfr
        self.nsr[s] = nsr
        self.pL[s] = pay.L.ctypes.data
        self.pLinv[s] = pay.Linv.ctypes.data
        self.pW[s] = pay.W.ctypes.data
        self.pY[s] = pay.y.ctypes.data
        self.fro_off[s] = off
        self.sep_off[s] = off
        fd = nf * self.d
        if fd > self.max_fd:
            self.max_fd = fd
            self.scratch = np.zeros(4 * fd, dtype=np.float64)
        rec.nslot = s
        return s

    def set_parent(self, rec: "CliqueRec", parent_rec: Optional["CliqueRec"]):
        self.parent[rec.nslot] = -1 if parent_rec is None else parent_rec.nslot

    def on_free(self, rec: "CliqueRec"):
        s = rec.nslot
        if s < 0:
            return
        self.alive[s] = 0
        self.pL[s] = self.pLinv[s] = self.pW[s] = self.pY[s] = 0
        self.live_ints -= max(int(self.nfr[s]), int(self.nsr[s]))
        self.free.append(s)
        rec.nslot = -1

    def maybe_compact(self, cliques):
        """Rebuild the gid buffers when dead entries dominate."""
        if self.cursor < (1 << 20) or self.cursor < 8 * max(1, self.live_ints):
            return
        new_f = np.zeros(self.buf_cap, dtype=np.int32)
        new_s = np.zeros(self.buf_cap, dtype=np.int32)
        cur = 0
        for rec in cliques:
            if rec is None or not rec.alive or rec.nslot < 0:
                continue
            s = rec.nslot
            nfr, nsr = int(self.nfr[s]), int(self.nsr[s])
            width = max(nfr, nsr)
            new_f[cur : cur + nfr] = self.fro_buf[
                self.fro_off[s] : self.fro_off[s] + nfr
            ]
            new_s[cur : cur + nsr] = self.sep_buf[
                self.sep_off[s] : self.sep_off[s] + nsr
            ]
            self.fro_off[s] = cur
            self.sep_off[s] = cur
            cur += width
        self.fro_buf = new_f
        self.sep_buf = new_s
        self.cursor = cur

    def sweep(self, x: np.ndarray, xcap: int, seeds: List[int],
              threshold: float) -> int:
        import ctypes

        dirty = np.zeros(xcap + 1, dtype=np.uint8)
        self.seed_mask[: self.top] = 0
        seeds_np = np.asarray(seeds, dtype=np.int32)
        c = lambda a: ctypes.c_void_p(a.ctypes.data)
        return int(
            self.lib.wildfire_sweep(
                self.top,
                c(self.parent), c(self.alive), c(self.nf), c(self.ns),
                c(self.nfr), c(self.nsr),
                c(self.pL), c(self.pLinv), c(self.pW), c(self.pY),
                c(self.fro_off), c(self.sep_off),
                c(self.fro_buf), c(self.sep_buf),
                c(x), self.d, xcap,
                c(seeds_np), len(seeds_np),
                float(threshold),
                c(dirty), c(self.seed_mask), c(self.scratch),
            )
        )


@dataclass
class FactorGroup:
    """Device store of one linear-factor family's cached linearization."""

    gid: int
    K: int
    dims: Tuple[int, ...]
    sign: float
    cap: int
    A: Tuple[jnp.ndarray, ...]  # per slot [cap+1, d, dim_k]
    b: jnp.ndarray  # [cap+1, d]
    keys: np.ndarray  # [cap, K] gids (host)
    n: int = 0


@dataclass
class MsgRec:
    """Persistent marginal factor (marginalizeLeaves output)."""

    mid: int
    ns: int  # pool class
    row: int  # row in the engine's msg pool for class ns
    scope: List[int]  # gids (first ns_real entries real, rest pad)
    alive: bool = True


# ---------------------------------------------------------------------------
# jitted primitives (cached per static signature)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _scatter_pool_jit(B, nf, ns, d, cap):
    def f(pool: PoolArrays, rows, out):
        return PoolArrays(
            L=pool.L.at[rows].set(out["L"]),
            Linv=pool.Linv.at[rows].set(out["Linv"]),
            W=pool.W.at[rows].set(out["W"]),
            y=pool.y.at[rows].set(out["y"]),
            U=pool.U.at[rows].set(out["U"]),
            ug=pool.ug.at[rows].set(out["ug"]),
        )

    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _gather_msgs_jit(M, ns, d, cap):
    def f(U, ug, rows):
        return U[rows], ug[rows]

    return jax.jit(f)


@lru_cache(maxsize=None)
def _gather_fac_jit(K, dims, d, cap, N):
    def f(A, b, rows):
        return tuple(Ak[rows] for Ak in A), b[rows]

    return jax.jit(f)


@lru_cache(maxsize=None)
def _set_rows_jit(K, cap, Np):
    """Scatter padded linearization rows into a factor group's device store.

    Pad entries point at the trash row `cap`, which is re-zeroed afterwards
    so message/factor gathers keep reading zeros there."""

    def f(A, b, idx, Anew, bnew):
        A2 = tuple(
            Ak.at[idx].set(An).at[cap].set(0.0) for Ak, An in zip(A, Anew)
        )
        b2 = b.at[idx].set(bnew).at[cap].set(0.0)
        return A2, b2

    return jax.jit(f, donate_argnums=(0, 1))


@lru_cache(maxsize=None)
def _copy_msg_jit(ns, d, src_cap, dst_cap):
    def f(dstU, dstug, drows, srcU, srcug, srows):
        return dstU.at[drows].set(srcU[srows]), dstug.at[drows].set(srcug[srows])

    return jax.jit(f, donate_argnums=(0, 1))


@lru_cache(maxsize=None)
def _wild_jit(B, nf, ns, d, cap, xcap):
    """One wildfire round for one shape class: gather clique factors,
    back-substitute given parent x, write frontal x, report change."""

    def f(pool: PoolArrays, rows, sep_idx, fro_idx, valid, x):
        Lg, Linvg, Wg, yg = pool.L[rows], pool.Linv[rows], pool.W[rows], pool.y[rows]
        if ns > 0:
            xs = x[sep_idx].reshape(B, ns * d)
            rhs = yg - _einsum("bfs,bs->bf", Wg, xs)
        else:
            rhs = yg
        xf = kernels.backsolve_bucket(Lg, Linvg, rhs, nf, d)
        xold = x[fro_idx].reshape(B, nf * d)
        change = jnp.max(jnp.abs(xf - xold), axis=1) * valid
        xnew = x.at[fro_idx.reshape(-1)].set(xf.reshape(B * nf, d))
        return xnew, change

    return jax.jit(f, donate_argnums=5)


@lru_cache(maxsize=None)
def _max_abs_jit(shape_rows):
    def f(x):
        return jnp.max(jnp.abs(x), axis=1)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _zero_rows_jit(xrows, nidx):
    def f(x, idx):
        return x.at[idx].set(0.0)

    return jax.jit(f, donate_argnums=0)


@dataclass
class _LocalPlan:
    """Cached structural plan of one local re-elimination (all index maps are
    functions of the local problem STRUCTURE only; device copies are uploaded
    once and reused across cache hits — the odometry steady state)."""

    cfg: Tuple  # _eliminate_jit signature
    # per factor-gather entry (sorted g order): (g, N, Np, blk_dev, gix_dev,
    # own_lcid [N] local clique owning each row)
    fac: List[Tuple]
    # per message class: (src, pkey, nsc, Mp, blk_dev, gix_dev,
    # entry_order [M] indices into the update's msg_entries, own_lcid [M])
    msg: List[Tuple]
    eye_rows_dev: jnp.ndarray
    eye_vals_dev: jnp.ndarray
    ext_dev: List[Tuple]
    # per level: (nf, ns, B_real, Bp, cliques: [(frontal_lv, separator_lv,
    # parent_lcid)]) where *_lv are indices into local_vars
    levels_meta: List[Tuple]
    n_cliques: int
    n_blocks: int = 0
    n_grows: int = 0
    lvl_offsets: Tuple = ()  # per real level (boff, goff)

    @property
    def nbytes(self) -> int:
        tot = self.eye_rows_dev.nbytes + self.eye_vals_dev.nbytes
        for (_, _, _, blk, gix, own) in self.fac:
            tot += blk.nbytes + gix.nbytes + own.nbytes
        for (_, _, _, _, blk, gix, _, own) in self.msg:
            tot += blk.nbytes + gix.nbytes + own.nbytes
        for (e, eg) in self.ext_dev:
            tot += e.nbytes + eg.nbytes
        return tot


# --- per-piece jits: compile granularity is a LEVEL SHAPE or a GROUP
# shape, never a whole plan, so loop-closure plans of any size reuse small
# cached executables (a whole-plan jit produced pathological multi-minute
# XLA compiles on large relinearization cascades) ---


@lru_cache(maxsize=None)
def _new_pool_jit(Pcap, Gcap, d, dtype_str):
    def f(dtype_probe):
        pool = jnp.zeros((Pcap + 1, d * d), dtype=dtype_probe.dtype)
        gp = jnp.zeros((Gcap + 1, d), dtype=dtype_probe.dtype)
        return pool, gp

    return jax.jit(f)


@lru_cache(maxsize=None)
def _scatter_group_jit(K, dims, sign, Np, d, Pcap, Gcap):
    """Scatter one factor group's Hessian blocks + gradient into the pool."""

    def f(pool, gp, A, b, blk, gix):
        for k in range(K):
            gk = _einsum("nri,nr->ni", A[k], b)
            if sign != 1.0:
                gk = gk * sign
            pk = d - gk.shape[-1]
            if pk:
                gk = jnp.pad(gk, ((0, 0), (0, pk)))
            gp = gp.at[gix[:, k]].add(gk)
            for l in range(K):
                v = _einsum("nri,nrj->nij", A[k], A[l])
                if sign != 1.0:
                    v = v * sign
                v = jnp.pad(
                    v, ((0, 0), (0, d - v.shape[1]), (0, d - v.shape[2]))
                )
                pool = pool.at[blk[:, k, l]].add(v.reshape(Np, d * d))
        return pool, gp

    return jax.jit(f, donate_argnums=(0, 1))


@lru_cache(maxsize=None)
def _scatter_msg_class_jit(nsc, Mp, d, Pcap, Gcap):
    def f(pool, gp, U, ug, blk, gix):
        Ub = (
            U.reshape(Mp, nsc, d, nsc, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(Mp * nsc * nsc, d * d)
        )
        pool = pool.at[blk.reshape(-1)].add(Ub)
        gp = gp.at[gix.reshape(-1)].add(ug.reshape(Mp * nsc, d))
        return pool, gp

    return jax.jit(f, donate_argnums=(0, 1))


@lru_cache(maxsize=None)
def _scatter_eye_jit(Pp, d, Pcap):
    def f(pool, rows, vals):
        return pool.at[rows].add(vals)

    return jax.jit(f, donate_argnums=0)


@lru_cache(maxsize=None)
def _level_jit(B, nf, ns, d, Pcap, Gcap):
    """Eliminate one level bucket: slice the pool at a dynamic offset,
    batched partial Cholesky, extend-add the Schur messages back."""
    mb = nf + ns
    m = mb * d
    dd = d * d

    def f(pool, gp, boff, goff, ext_idx, extg_idx):
        blocks = jax.lax.dynamic_slice(pool, (boff, 0), (B * mb * mb, dd))
        Fm = (
            blocks.reshape(B, mb, mb, d, d)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, m, m)
        )
        gm = jax.lax.dynamic_slice(gp, (goff, 0), (B * mb, d)).reshape(B, m)
        out = kernels.partial_cholesky(Fm, gm, nf, d)
        if ns > 0:
            Ublk = (
                out["U"]
                .reshape(B, ns, d, ns, d)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B * ns * ns, dd)
            )
            pool = pool.at[ext_idx.reshape(-1)].add(Ublk)
            gp = gp.at[extg_idx.reshape(-1)].add(out["ug"].reshape(B * ns, d))
        return pool, gp, out

    return jax.jit(f, donate_argnums=(0, 1))



# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------


class IncrementalEngine:
    """Linear-level incremental multifrontal solver (GaussianISAM analog).

    The nonlinear wrapper (nonlinear/isam2.py) owns linearization points and
    relinearization policy; this engine owns the Bayes tree, cached linear
    factors, and the delta vector x [n, d] (gid order, padded to d)."""

    def __init__(self, d: int, dtype=jnp.float64, backend: str = "auto"):
        """backend: "jax" (jitted shape-class kernels), "numpy" (eager BLAS
        — zero compilation; the right choice for CPU-latency incremental
        workloads whose loop closures generate fresh shape signatures), or
        "auto" (numpy on CPU hosts, jax on accelerators)."""
        if backend == "auto":
            backend = "numpy" if jax.default_backend() == "cpu" else "jax"
        self._np = backend == "numpy"
        self.backend = backend
        self.d = d
        self.dtype = dtype
        self._npdtype = np.dtype(str(jnp.dtype(dtype)))
        self.n = 0  # variables (gids 0..n-1)
        self.var_dims = np.zeros(0, dtype=np.int64)
        # xcap keys EVERY wildfire jit signature: a growth event recompiles
        # the whole wildfire kernel family. 16k rows of [d] f64 is ~1 MB —
        # start above the City10000 pose count so it never grows mid-run.
        self.xcap = 16384
        if self._np:
            self.x = np.zeros((self.xcap + 1, d), dtype=self._npdtype)
        else:
            self.x = jnp.zeros((self.xcap + 1, d), dtype=dtype)
        self.pools: Dict[Tuple[int, int], PoolClass] = {}
        self.msg_pools: Dict[int, PoolClass] = {}  # persistent marginals
        # numpy backend: NO pools — exact per-clique payload arrays keyed by
        # cid (freed with the clique). Shape-class pools exist to stabilize
        # jit signatures; eagerly-executing numpy gains nothing from them and
        # the unbounded variety of loop-closure (nf, ns) classes made pooled
        # capacity retention grow superlinearly (the round-4 City10000 OOM:
        # 2,700+ classes holding 85 GB for <1k live cliques).
        self.payloads: Dict[int, PoolArrays] = {}
        self.msg_payloads: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        # native wildfire sweep (solve_native.cpp): deep incremental trees
        # make back-substitution a sequential descent; per-clique cost must
        # be ~1 us (C) rather than ~100 us (Python frontier loop)
        self._nat: Optional[_NativeTree] = None
        if self._np and self._npdtype == np.float64:
            from gtsam_petercdev_tpu.native.build import load_solve_library

            lib = load_solve_library()
            if lib is not None:
                self._nat = _NativeTree(lib, d)
        self.cliques: List[Optional[CliqueRec]] = []
        self.var_clique: Dict[int, int] = {}  # gid -> cid (frontal owner)
        self.groups: List[FactorGroup] = []
        self._group_key: Dict[Tuple, int] = {}
        self.var_factors: Dict[int, List[Tuple[int, int]]] = {}  # gid->[(g,row)]
        self.msgs: List[Optional[MsgRec]] = []
        self.var_msgs: Dict[int, List[int]] = {}  # gid -> [mid] (scope index)
        self.last_bad_pivots = 0
        self.n_live = 0  # live clique count (maintained incrementally)
        # factor units excised via remove_factor_units: filtered out of
        # owned_fac collection at the next re-elimination touching them
        # (ISAM2UpdateParams.removeFactorIndices analog)
        self.removed_units: Set[Tuple[int, int]] = set()
        # structural local-plan cache (ISAM2 steady state: the odometry
        # update's structure repeats -> all host planning + index-map
        # uploads are skipped)
        self._plan_cache: "OrderedDict[Tuple, _LocalPlan]" = OrderedDict()
        self._plan_cache_cap = 128
        self._plan_cache_bytes = 0
        self._plan_cache_byte_cap = 64 * 2**20  # index maps; LRU-evicted
        # engine-global scratch-pool capacities (monotone, x4 growth): the
        # assembly/level kernels' jit signatures include these, so keeping
        # them global bounds the number of distinct compiled executables
        # (per-plan capacities caused unbounded compile churn -> OOM).
        # Start at the City10000-scale working set (a few MB) so the axis
        # contributes ONE value for the whole run instead of re-compiling
        # every kernel at each growth step.
        self.pool_cap = 65536
        self.gp_cap = 8192

    # -- variables / factors ------------------------------------------------

    def add_variables(self, dims: Sequence[int]) -> List[int]:
        gids = list(range(self.n, self.n + len(dims)))
        self.n += len(dims)
        self.var_dims = np.concatenate(
            [self.var_dims, np.asarray(dims, dtype=np.int64)]
        )
        while self.n > self.xcap:
            self.xcap *= 4
            if self._np:
                nx = np.zeros((self.xcap + 1, self.d), dtype=self._npdtype)
                nx[: self.x.shape[0] - 1] = self.x[:-1]
                self.x = nx
            else:
                nx = jnp.zeros((self.xcap + 1, self.d), dtype=self.dtype)
                self.x = nx.at[: self.x.shape[0] - 1].set(self.x[:-1])
        return gids

    def group_for(self, key: Tuple, K: int, dims: Tuple[int, ...], sign: float) -> int:
        g = self._group_key.get(key)
        if g is not None:
            return g
        g = len(self.groups)
        cap = 4096  # keys the gather/set jits; start big, grow rarely
        d = self.d
        zeros = (
            (lambda s: np.zeros(s, dtype=self._npdtype))
            if self._np
            else (lambda s: jnp.zeros(s, dtype=self.dtype))
        )
        self.groups.append(
            FactorGroup(
                gid=g,
                K=K,
                dims=tuple(dims),
                sign=float(sign),
                cap=cap,
                A=tuple(zeros((cap + 1, d, dk)) for dk in dims),
                b=zeros((cap + 1, d)),
                keys=np.zeros((cap, K), dtype=np.int64),
            )
        )
        self._group_key[key] = g
        return g

    def _grow_group(self, fg: FactorGroup, need: int):
        cap = fg.cap
        while cap < need:
            cap *= 16
        d = self.d
        if self._np:
            A = []
            for dk, Ak in zip(fg.dims, fg.A):
                An = np.zeros((cap + 1, d, dk), dtype=self._npdtype)
                An[: fg.cap] = Ak[: fg.cap]
                A.append(An)
            A = tuple(A)
            b = np.zeros((cap + 1, d), dtype=self._npdtype)
            b[: fg.cap] = fg.b[: fg.cap]
        else:
            A = tuple(
                jnp.zeros((cap + 1, d, dk), dtype=self.dtype)
                .at[: fg.cap]
                .set(Ak[: fg.cap])
                for dk, Ak in zip(fg.dims, fg.A)
            )
            b = (
                jnp.zeros((cap + 1, d), dtype=self.dtype)
                .at[: fg.cap]
                .set(fg.b[: fg.cap])
            )
        keys = np.zeros((cap, fg.K), dtype=np.int64)
        keys[: fg.n] = fg.keys[: fg.n]
        fg.A, fg.b, fg.keys, fg.cap = A, b, keys, cap

    def add_factors(self, g: int, gids: np.ndarray, A, b) -> List[int]:
        """Append factor rows with their (already whitened) linearization."""
        fg = self.groups[g]
        nnew = gids.shape[0]
        if fg.n + nnew > fg.cap:
            self._grow_group(fg, fg.n + nnew)
        rows = list(range(fg.n, fg.n + nnew))
        fg.keys[fg.n : fg.n + nnew] = gids
        self.set_factor_rows(g, rows, A, b)
        fg.n += nnew
        for i, r in enumerate(rows):
            for k in range(fg.K):
                self.var_factors.setdefault(int(gids[i, k]), []).append((g, r))
        return rows

    def set_factor_rows(self, g: int, rows, A, b):
        """Overwrite cached linearization of existing rows (relinearize).

        A/b may be shape-padded beyond len(rows); pad entries write to the
        trash row which is re-zeroed in the same fused device call."""
        fg = self.groups[g]
        Np = np.asarray(b).shape[0]
        idx_np = np.full(Np, fg.cap, dtype=np.int32)
        idx_np[: len(rows)] = np.asarray(rows, dtype=np.int32)
        if self._np:
            for Ak, An in zip(fg.A, A):
                Ak[idx_np] = np.asarray(An, dtype=self._npdtype)
                Ak[fg.cap] = 0.0
            fg.b[idx_np] = np.asarray(b, dtype=self._npdtype)
            fg.b[fg.cap] = 0.0
            return
        b = jnp.asarray(b, dtype=self.dtype)
        A = tuple(jnp.asarray(Ak, dtype=self.dtype) for Ak in A)
        fg.A, fg.b = _set_rows_jit(fg.K, fg.cap, Np)(
            fg.A, fg.b, jnp.asarray(idx_np), A, b
        )

    def remove_factor_units(self, units) -> Set[int]:
        """Excise cached factor units from the tree's bookkeeping; returns
        the set of gids the caller must re-eliminate (update(marked=...))
        for the information to actually leave the tree."""
        marked: Set[int] = set()
        for (g, r) in units:
            u = (g, r)
            self.removed_units.add(u)
            fg = self.groups[g]
            for k in range(fg.K):
                gid = int(fg.keys[r, k])
                marked.add(gid)
                lst = self.var_factors.get(gid)
                if lst:
                    self.var_factors[gid] = [x for x in lst if x != u]
        return marked

    # -- affected-set computation (removeTop) --------------------------------

    def _cliques_containing(self, gid: int) -> List[int]:
        """All live cliques whose scope contains gid: the containment subtree
        rooted at gid's frontal clique (BayesTree subtree property)."""
        c0 = self.var_clique.get(gid)
        if c0 is None:
            return []
        out, stack = [], [c0]
        while stack:
            cid = stack.pop()
            out.append(cid)
            for ch in self.cliques[cid].children:
                if gid in self.cliques[ch].separator:
                    stack.append(ch)
        return out

    def _affected_set(self, marked: Set[int], relin: Set[int]) -> Set[int]:
        aff: Set[int] = set()
        seeds: Set[int] = set()
        for gid in marked:
            c = self.var_clique.get(gid)
            if c is not None:
                seeds.add(c)
        for gid in relin:
            seeds.update(self._cliques_containing(gid))
        for cid in seeds:
            while cid >= 0 and cid not in aff:
                aff.add(cid)
                cid = self.cliques[cid].parent
        return aff

    # -- the update -----------------------------------------------------------

    def update(
        self,
        new_keys: Sequence[int] = (),
        new_fac_units: Sequence[Tuple[int, int]] = (),
        marked: Set[int] = frozenset(),
        relin: Set[int] = frozenset(),
        first: Sequence[int] = (),
        wildfire_threshold: float = 0.0,
    ) -> Dict:
        """Re-eliminate the affected top of the tree (ISAM2::recalculate).

        new_keys: gids entering the tree this update (ordered LAST —
        ColamdConstrainedLast, inference/Ordering.cpp:128).
        new_fac_units: (group, row) factor rows added this update.
        marked: existing gids touched by new factors (removeTop marking).
        relin: gids whose linearization changed (fluid containment marking).
        first: gids to order FIRST (marginalization staging).
        """
        new_keys = [g for g in new_keys if g not in self.var_clique]
        aff = self._affected_set(set(marked) | set(relin), set(relin))

        orphan_cids: List[int] = []
        fac_units: Set[Tuple[int, int]] = set(new_fac_units)
        msg_ids: List[int] = []
        local_vars: List[int] = list(new_keys)
        for cid in aff:
            c = self.cliques[cid]
            local_vars.extend(c.frontal)
            fac_units.update(
                u for u in c.owned_fac if u not in self.removed_units
            )
            msg_ids.extend(mid for mid in c.owned_msg if self.msgs[mid].alive)
            for ch in c.children:
                if ch not in aff:
                    orphan_cids.append(ch)
        stats = self._reeliminate(
            sorted(set(local_vars)),
            sorted(fac_units),
            sorted(set(msg_ids)),
            sorted(orphan_cids),
            aff,
            new_last=list(new_keys),
            first=list(first),
            wildfire_threshold=wildfire_threshold,
        )
        stats["n_affected_cliques"] = len(aff)
        stats["n_orphans"] = len(orphan_cids)
        return stats

    # -- local elimination ------------------------------------------------------

    def _reeliminate(
        self,
        local_vars: List[int],
        fac_units: List[Tuple[int, int]],
        msg_ids: List[int],
        orphan_cids: List[int],
        dead: Set[int],
        new_last: List[int],
        first: List[int],
        wildfire_threshold: float = 0.0,
    ) -> Dict:
        d = self.d
        m = len(local_vars)
        if m == 0:
            return {"n_reeliminated": 0, "bad_pivots": 0}
        lva = np.asarray(local_vars, dtype=np.int64)
        lid_arr = np.full(self.n, -1, dtype=np.int64)
        lid_arr[lva] = np.arange(m)

        # ---- symbolic structure (vectorized) + plan-cache signature ----
        per_group: Dict[int, List[int]] = {}
        for (g, r) in fac_units:
            per_group.setdefault(g, []).append(r)
        fac_entries = []  # (g, rows[N], lids[N,K])
        sig_parts: List = [m, self.var_dims[lva].tobytes()]
        for g in sorted(per_group):
            fg = self.groups[g]
            rows = np.asarray(sorted(set(per_group[g])), dtype=np.int64)
            lids = lid_arr[fg.keys[rows]]
            fac_entries.append((g, rows, lids))
            sig_parts.append((g, lids.shape[0], lids.tobytes()))
        # (src, pool_key, ref, scope_lids); ref is the pool ROW for the jax
        # backend, the cid/mid payload key for numpy
        msg_entries = []
        for cid in orphan_cids:
            c = self.cliques[cid]
            sc = lid_arr[np.asarray(c.separator, dtype=np.int64)]
            msg_entries.append(("clq", c.cls, cid if self._np else c.row, sc))
            sig_parts.append(("clq", c.cls, sc.tobytes()))
        for mid in msg_ids:
            mr = self.msgs[mid]
            sc = lid_arr[np.asarray(mr.scope, dtype=np.int64)]
            msg_entries.append(("msg", mr.ns, mid if self._np else mr.row, sc))
            sig_parts.append(("msg", mr.ns, sc.tobytes()))
        first_l = frozenset(
            int(lid_arr[g]) for g in first if lid_arr[g] >= 0
        )
        last_l = frozenset(
            int(lid_arr[g]) for g in new_last if lid_arr[g] >= 0
        ) - first_l
        sig_parts.append((tuple(sorted(first_l)), tuple(sorted(last_l))))
        sig = tuple(sig_parts)

        plan = self._plan_cache.get(sig)
        if plan is None:
            plan = self._build_plan(lva, fac_entries, msg_entries, first_l, last_l)
            if m <= 512:  # closure cascades don't repeat structurally
                self._plan_cache[sig] = plan
                self._plan_cache_bytes += plan.nbytes
                while self._plan_cache and (
                    len(self._plan_cache) > self._plan_cache_cap
                    or self._plan_cache_bytes > self._plan_cache_byte_cap
                ):
                    _, old = self._plan_cache.popitem(last=False)
                    self._plan_cache_bytes -= old.nbytes
        else:
            self._plan_cache.move_to_end(sig)

        # ---- runtime: assemble the block pool (per-group scatters) ----
        dd = d * d
        own_fac: Dict[int, List[Tuple[int, int]]] = {}
        own_msg: Dict[int, List[int]] = {}
        orphan_owner: Dict[int, int] = {}  # orphan entry idx -> owner lcid
        if self._np:
            pool = np.zeros((plan.n_blocks + 1, dd), dtype=self._npdtype)
            gp = np.zeros((plan.n_grows + 1, d), dtype=self._npdtype)
            # trash rows (n_blocks / n_grows) exist in the pools, so the
            # immediate native path needs no drop filter
            acc_pool = _NpAccum(dd, dst=pool)
            acc_gp = _NpAccum(d, dst=gp)
            Pcap = Gcap = 0
        else:
            while self.pool_cap < plan.n_blocks + 1:
                self.pool_cap *= 4
            while self.gp_cap < plan.n_grows + 1:
                self.gp_cap *= 4
            Pcap = self.pool_cap
            Gcap = self.gp_cap
            pool, gp = _new_pool_jit(Pcap, Gcap, d, str(self.dtype))(self.x)
        for (g, rows, _), (_, N, Np, blk_dev, gix_dev, own_lcid) in zip(
            fac_entries, plan.fac
        ):
            fg = self.groups[g]
            if self._np:
                A = tuple(Ak[rows] for Ak in fg.A)
                b = fg.b[rows]
                blk = np.asarray(blk_dev)[:N]
                gix = np.asarray(gix_dev)[:N]
                for k in range(fg.K):
                    gk = np.matmul(A[k].transpose(0, 2, 1), b[:, :, None])[
                        :, :, 0
                    ]
                    if fg.sign != 1.0:
                        gk = gk * fg.sign
                    acc_gp.add(gix[:, k], _np_pad_last(gk, d))
                    for l in range(fg.K):
                        v = np.matmul(A[k].transpose(0, 2, 1), A[l])
                        if fg.sign != 1.0:
                            v = v * fg.sign
                        v = np.pad(
                            v,
                            ((0, 0), (0, d - v.shape[1]), (0, d - v.shape[2])),
                        )
                        acc_pool.add(blk[:, k, l], v.reshape(N, dd))
            else:
                rows_p = np.full(Np, fg.cap, dtype=np.int32)
                rows_p[:N] = rows
                A, b = _gather_fac_jit(fg.K, fg.dims, d, fg.cap, Np)(
                    fg.A, fg.b, jnp.asarray(rows_p)
                )
                pool, gp = _scatter_group_jit(
                    fg.K, fg.dims, fg.sign, Np, d, Pcap, Gcap
                )(pool, gp, A, b, blk_dev, gix_dev)
            for i in range(N):
                own_fac.setdefault(int(own_lcid[i]), []).append(
                    (g, int(rows[i]))
                )
        for (src, pkey, nsc, Mp, blk_dev, gix_dev, order, own_lcid) in plan.msg:
            if not self._np:
                pc = self.pools[pkey] if src == "clq" else self.msg_pools[pkey]
                rows_p = np.full(Mp, pc.cap, dtype=np.int32)
            for mi, ei in enumerate(order):
                if not self._np:
                    rows_p[mi] = msg_entries[ei][2]
                if src == "msg":
                    own_msg.setdefault(int(own_lcid[mi]), []).append(
                        msg_ids[ei - len(orphan_cids)]
                    )
                else:
                    orphan_owner[ei] = int(own_lcid[mi])
            if self._np:
                M = len(order)
                if src == "clq":
                    pays = [self.payloads[msg_entries[ei][2]] for ei in order]
                    U = np.stack([p.U for p in pays])
                    ug = np.stack([p.ug for p in pays])
                else:
                    mpays = [
                        self.msg_payloads[msg_entries[ei][2]] for ei in order
                    ]
                    U = np.stack([u for (u, _) in mpays])
                    ug = np.stack([g_ for (_, g_) in mpays])
                Ub = (
                    U.reshape(M, nsc, d, nsc, d)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(M * nsc * nsc, dd)
                )
                blk = np.asarray(blk_dev)[:M]
                gix = np.asarray(gix_dev)[:M]
                acc_pool.add(blk.reshape(-1), Ub)
                acc_gp.add(gix.reshape(-1), ug.reshape(M * nsc, d))
            else:
                U, ug = _gather_msgs_jit(Mp, nsc, d, pc.cap)(
                    pc.arrays.U, pc.arrays.ug, jnp.asarray(rows_p)
                )
                pool, gp = _scatter_msg_class_jit(nsc, Mp, d, Pcap, Gcap)(
                    pool, gp, U, ug, blk_dev, gix_dev
                )
        if self._np:
            acc_pool.add(
                np.asarray(plan.eye_rows_dev), np.asarray(plan.eye_vals_dev)
            )
            acc_pool.flush_into(pool)
            acc_gp.flush_into(gp)
        else:
            pool = _scatter_eye_jit(plan.eye_rows_dev.shape[0], d, Pcap)(
                pool, plan.eye_rows_dev, plan.eye_vals_dev
            )

        # ---- bottom-up level sweep ----
        # native path (numpy f64): ONE C call assembles each clique's
        # frontal matrix from the block pool, factors it into its payload
        # arrays, and extend-adds the Schur message — no per-level numpy
        outs = []
        nat_pay = None
        bad = 0 if self._np else jnp.zeros((), jnp.int32)
        if self._np and self._nat is not None:
            nat_pay, bad = self._native_eliminate(plan, pool, gp)
        for li, (nf, ns, B_real, Bp, clqs) in enumerate(
            () if nat_pay is not None else plan.levels_meta
        ):
            boff, goff = plan.lvl_offsets[li]
            ext_dev, extg_dev = plan.ext_dev[li]
            if self._np:
                mb = nf + ns
                m_ = mb * d
                blocks = pool[boff : boff + Bp * mb * mb]
                Fm = (
                    blocks.reshape(Bp, mb, mb, d, d)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(Bp, m_, m_)
                )
                gm = gp[goff : goff + Bp * mb].reshape(Bp, m_)
                out = kernels_np.partial_cholesky(Fm, gm, nf, d)
                if ns > 0:
                    Ublk = (
                        out["U"]
                        .reshape(Bp, ns, d, ns, d)
                        .transpose(0, 1, 3, 2, 4)
                        .reshape(Bp * ns * ns, dd)
                    )
                    acc_pool.add(np.asarray(ext_dev).reshape(-1), Ublk)
                    acc_pool.flush_into(pool, trash_row=plan.n_blocks)
                    acc_gp.add(
                        np.asarray(extg_dev).reshape(-1),
                        out["ug"].reshape(Bp * ns, d),
                    )
                    acc_gp.flush_into(gp, trash_row=plan.n_grows)
            else:
                pool, gp, out = _level_jit(Bp, nf, ns, d, Pcap, Gcap)(
                    pool, gp, boff, goff, ext_dev, extg_dev
                )
            bad = bad + out["bad"]
            outs.append(out)

        # ---- retire dead cliques, free pool rows ----
        for cid in dead:
            c = self.cliques[cid]
            c.alive = False
            if self._np:
                if self._nat is not None:
                    self._nat.on_free(c)
                self.payloads.pop(cid, None)
            else:
                self.pools[c.cls].free.append(c.row)
            self.cliques[cid] = None
        self.n_live -= len(dead)

        # ---- create new clique records + scatter payloads into pools ----
        new_by_level: List[List[int]] = []
        local2global: Dict[int, int] = {}
        for li, (nf, ns, B_real, Bp, clqs) in enumerate(plan.levels_meta):
            cls = (nf, ns)
            if self._np:
                pc = None
            else:
                pc = self.pools.get(cls)
                if pc is None:
                    pc = PoolClass(
                        nf, ns, 0, _make_pool(nf, ns, d, 0, self.dtype, False)
                    )
                    self.pools[cls] = pc
            rows_np = np.full(Bp, 0, dtype=np.int32)
            lv_cids = []
            for i, (pcid, fro_lv, sep_lv, par) in enumerate(clqs):
                if self._np:
                    r = -1
                else:
                    r = pc.alloc()
                    while r < 0:
                        self.pools[cls] = pc = _grow_pool(
                            pc, d, self.dtype, False
                        )
                        r = pc.alloc()
                    rows_np[i] = r
                gcid = len(self.cliques)
                rec = CliqueRec(
                    cid=gcid,
                    cls=cls,
                    row=r,
                    frontal=[local_vars[v] for v in fro_lv],
                    separator=[local_vars[v] for v in sep_lv],
                    owned_fac=own_fac.get(pcid, []),
                    owned_msg=own_msg.get(pcid, []),
                )
                self.cliques.append(rec)
                local2global[pcid] = gcid
                lv_cids.append(gcid)
                for gid in rec.frontal:
                    self.var_clique[gid] = gcid
                if self._np:
                    if nat_pay is not None:
                        # C wrote the payload arrays directly
                        pay = nat_pay[li][i]
                    else:
                        out = outs[li]
                        # .copy(), NOT ascontiguousarray: leading-axis
                        # slices are already contiguous, so that returns a
                        # VIEW pinning the whole level output alive as
                        # long as any one clique lives
                        pay = PoolArrays(
                            L=out["L"][i].copy(),
                            Linv=out["Linv"][i].copy(),
                            W=out["W"][i].copy(),
                            y=out["y"][i].copy(),
                            U=out["U"][i].copy(),
                            ug=out["ug"][i].copy(),
                        )
                    self.payloads[gcid] = pay
                    if self._nat is not None:
                        self._nat.alloc(rec, pay)
            if not self._np:
                rows_np[B_real:] = pc.cap  # trash
                self.pools[cls] = PoolClass(
                    pc.nf, pc.ns, pc.cap,
                    _scatter_pool_jit(Bp, nf, ns, d, pc.cap)(
                        pc.arrays, jnp.asarray(rows_np), outs[li]
                    ),
                    pc.free, pc.top,
                )
            new_by_level.append(lv_cids)
        self.n_live += plan.n_cliques

        # ---- wire the tree: parents/children of new cliques + orphans ----
        for (nf, ns, B_real, Bp, clqs) in plan.levels_meta:
            for (pcid, _, _, par) in clqs:
                if par >= 0:
                    gcid = local2global[pcid]
                    pg = local2global[par]
                    self.cliques[gcid].parent = pg
                    self.cliques[pg].children.add(gcid)
                    if self._nat is not None:
                        self._nat.set_parent(
                            self.cliques[gcid], self.cliques[pg]
                        )
        for ei, cid in enumerate(orphan_cids):
            c = self.cliques[cid]
            pg = local2global[orphan_owner[ei]]
            c.parent = pg
            self.cliques[pg].children.add(cid)
            if self._nat is not None:
                self._nat.set_parent(c, self.cliques[pg])
        if self._nat is not None:
            self._nat.maybe_compact(self.cliques)

        # ---- wildfire back-substitution from the new cliques ----
        n_rounds = self._wildfire(new_by_level, wildfire_threshold)
        return {
            "n_reeliminated": plan.n_cliques,
            "bad_pivots": bad,
            "wildfire_rounds": n_rounds,
        }

    def _native_eliminate(self, plan: "_LocalPlan", pool, gp):
        """Run the whole bottom-up level sweep through ONE C call
        (solve_native.cpp eliminate_sweep), with the per-clique payload
        arrays pre-allocated so C writes them in place. Returns the
        level-major payload list and the bad-pivot count."""
        import ctypes

        lib = self._nat.lib
        d = self.d
        nl = len(plan.levels_meta)
        nf_a = np.empty(nl, np.int64)
        ns_a = np.empty(nl, np.int64)
        B_a = np.empty(nl, np.int64)
        bo_a = np.empty(nl, np.int64)
        go_a = np.empty(nl, np.int64)
        extp = np.empty(nl, np.uint64)
        extgp = np.empty(nl, np.uint64)
        total = sum(meta[2] for meta in plan.levels_meta)
        pp = [np.empty(total, np.uint64) for _ in range(6)]
        nat_pay: List[List[PoolArrays]] = []
        ci = 0
        max_m = 1
        ext_refs = []
        for li, (nf, ns, B_real, Bp, clqs) in enumerate(plan.levels_meta):
            fd, sd = nf * d, ns * d
            m = fd + sd
            max_m = max(max_m, m)
            nf_a[li], ns_a[li], B_a[li] = nf, ns, B_real
            bo_a[li], go_a[li] = plan.lvl_offsets[li]
            ext, extg = plan.ext_dev[li]
            ext = np.ascontiguousarray(ext, dtype=np.int32)
            extg = np.ascontiguousarray(extg, dtype=np.int32)
            ext_refs.append((ext, extg))
            extp[li] = ext.ctypes.data
            extgp[li] = extg.ctypes.data
            # per-clique allocations, NOT per-level arenas: an arena view
            # pins the whole level alive while any one clique survives —
            # exactly the retention class that OOM'd round 4 (measured:
            # multi-GB RSS growth on loop-closure cascades). The alloc cost
            # is noise next to the C sweep.
            lv_pays = []
            for _ in range(B_real):
                pay = PoolArrays(
                    L=np.empty((fd, fd)),
                    Linv=np.empty((nf, d, d)),
                    W=np.empty((fd, sd)),
                    y=np.empty(fd),
                    U=np.empty((sd, sd)),
                    ug=np.empty(sd),
                )
                lv_pays.append(pay)
                for slot, arr in enumerate(pay):
                    pp[slot][ci] = arr.ctypes.data
                ci += 1
            nat_pay.append(lv_pays)
        work = np.empty(max_m * (max_m + 1))
        c = lambda a: ctypes.c_void_p(a.ctypes.data)
        bad = lib.eliminate_sweep(
            c(pool), c(gp), d, nl,
            c(nf_a), c(ns_a), c(B_a), c(bo_a), c(go_a),
            c(extp), c(extgp),
            c(pp[0]), c(pp[1]), c(pp[2]), c(pp[3]), c(pp[4]), c(pp[5]),
            1e-10, c(work),
        )
        return nat_pay, int(bad)

    def _build_plan(
        self,
        lva: np.ndarray,
        fac_entries,
        msg_entries,
        first_l: frozenset,
        last_l: frozenset,
    ) -> _LocalPlan:
        """Host symbolic planning for one local-problem STRUCTURE (cache
        miss only): ordering, supernodes, level layout, all index maps.
        Device copies of the constant maps are uploaded here, once."""
        d = self.d
        m = len(lva)
        up = (lambda a: a) if self._np else jnp.asarray
        # numpy backend executes eagerly: shape padding and batch chunking
        # only exist to bound jit-signature counts, so use exact shapes
        padf = (lambda x: max(1, x)) if self._np else _pad
        bclassf = (lambda x: max(1, x)) if self._np else _b_class
        chunk = (1 << 30) if self._np else _B_CHUNK
        factor_vars = [lids for (_, _, lids) in fac_entries] + [
            sc[None, :] for (_, _, _, sc) in msg_entries
        ]

        # ---- ordering: [first | colamd middle | new_last] ----
        edge_list = []
        for fv in factor_vars:
            K = fv.shape[1]
            for a in range(K):
                for b_ in range(a + 1, K):
                    edge_list.append(np.stack([fv[:, a], fv[:, b_]], axis=1))
        edges = (
            np.concatenate(edge_list, axis=0)
            if edge_list
            else np.zeros((0, 2), np.int64)
        )
        base = ccolamd_ordering(m, edges)
        order = np.asarray(
            [v for v in base if v in first_l]
            + [v for v in base if v not in first_l and v not in last_l]
            + [v for v in base if v in last_l],
            dtype=np.int64,
        )
        barrier = first_l if first_l else None
        plan = symbolic_eliminate(
            m, factor_vars, d, ordering=order, max_buckets_per_level=1,
            no_merge_across=barrier,
            pad_fn=(lambda x: max(1, x)) if self._np else _pad_class,
        )

        # ---- layout: one padded bucket per level + dummy levels ----
        iperm = plan.iperm
        cliques = plan.cliques
        for c in cliques:
            c._fpos = {v: i for i, v in enumerate(c.frontal)}
            c._spos = {v: i for i, v in enumerate(c.separator)}

        def cpos(c, pv):
            p = c._fpos.get(pv)
            return p if p is not None else c.bucket[0] + c._spos[pv]

        # split each level's bucket into <=_B_CHUNK chunks (chunks of one
        # level are independent: parents live in strictly later levels, so
        # sequential chunk calls preserve the bottom-up extend-add order)
        real_buckets = []
        for lv in plan.levels:
            bk = lv[0]
            for s in range(0, max(1, len(bk.cliques)), chunk):
                ck = bk.cliques[s : s + chunk]
                real_buckets.append(
                    (_BucketChunk(bk.nf, bk.ns, ck), bclassf(len(ck)))
                )
        n_levels_pad = padf(max(1, len(real_buckets)))
        bucket_sig = tuple((Bp, bk.nf, bk.ns) for bk, Bp in real_buckets) + tuple(
            (1, 1, 0) for _ in range(n_levels_pad - len(real_buckets))
        )

        blk_base = np.zeros(len(cliques), dtype=np.int64)
        g_base = np.zeros(len(cliques), dtype=np.int64)
        mb_of = np.zeros(len(cliques), dtype=np.int64)
        boff = goff = 0
        dummy_diag_rows = []
        lvl_offsets = []
        for (bk, Bp) in real_buckets:
            lvl_offsets.append((boff, goff))
            mb = bk.nf + bk.ns
            for i, cid in enumerate(bk.cliques):
                blk_base[cid] = boff + i * mb * mb
                g_base[cid] = goff + i * mb
                mb_of[cid] = mb
            # pad cliques of this bucket get identity frontal diagonals
            for i in range(len(bk.cliques), Bp):
                for j in range(bk.nf):
                    dummy_diag_rows.append(boff + i * mb * mb + j * mb + j)
            boff += Bp * mb * mb
            goff += Bp * mb
        for _ in range(n_levels_pad - len(real_buckets)):
            dummy_diag_rows.append(boff)
            boff += 1
            goff += 1
        n_blocks, n_grows = boff, goff
        trash_blk, trash_g = n_blocks, n_grows

        # ---- factor scatter maps + ownership ----
        groups_sig, plan_fac = [], []
        for (g, rows, lids) in fac_entries:
            fg = self.groups[g]
            N, K = lids.shape
            Np = padf(N)
            pvs = iperm[lids]
            own = plan.var_clique[pvs.min(axis=1)]
            blk = np.full((Np, K, K), trash_blk, dtype=np.int64)
            gix = np.full((Np, K), trash_g, dtype=np.int64)
            pos = np.empty((N, K), dtype=np.int64)
            for i in range(N):
                c = cliques[own[i]]
                for k in range(K):
                    pos[i, k] = cpos(c, pvs[i, k])
            for k in range(K):
                for l in range(K):
                    blk[:N, k, l] = (
                        blk_base[own] + pos[:, k] * mb_of[own] + pos[:, l]
                    )
                gix[:N, k] = g_base[own] + pos[:, k]
            groups_sig.append((K, fg.dims, fg.sign, Np))
            plan_fac.append(
                (g, N, Np, up(blk.astype(np.int32)),
                 up(gix.astype(np.int32)), own.copy())
            )

        # ---- message scatter maps ----
        by_class: Dict[Tuple, List[int]] = {}
        for i, (src, pkey, row, sc) in enumerate(msg_entries):
            nsc = pkey[1] if src == "clq" else pkey
            by_class.setdefault((src, pkey, nsc), []).append(i)
        msg_sigs, plan_msg = [], []
        for (src, pkey, nsc), idxs in sorted(
            by_class.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
        ):
            M = len(idxs)
            Mp = padf(M)
            blk = np.full((Mp, nsc, nsc), trash_blk, dtype=np.int64)
            gix = np.full((Mp, nsc), trash_g, dtype=np.int64)
            own_lcid = np.zeros(M, dtype=np.int64)
            for mi, ei in enumerate(idxs):
                sc = msg_entries[ei][3]
                pv = iperm[sc]
                ownc = cliques[plan.var_clique[pv.min()]]
                own_lcid[mi] = ownc.cid
                ps = np.asarray([cpos(ownc, p) for p in pv], dtype=np.int64)
                nr = len(sc)
                blk[mi, :nr, :nr] = (
                    blk_base[ownc.cid] + ps[:, None] * mb_of[ownc.cid] + ps[None, :]
                )
                gix[mi, :nr] = g_base[ownc.cid] + ps
            msg_sigs.append((nsc, Mp))
            plan_msg.append(
                (src, pkey, nsc, Mp, up(blk.astype(np.int32)),
                 up(gix.astype(np.int32)), list(idxs), own_lcid)
            )

        # ---- identity padding rows ----
        dd = d * d
        eye_rows, eye_vals = list(dummy_diag_rows), []
        eye_flat = np.eye(d).reshape(-1)
        eye_vals.extend([eye_flat] * len(dummy_diag_rows))
        for c in cliques:
            nf_pad = c.bucket[0]
            mb = mb_of[c.cid]
            for i in range(len(c.frontal), nf_pad):
                eye_rows.append(blk_base[c.cid] + i * mb + i)
                eye_vals.append(eye_flat)
            for i, pv in enumerate(c.frontal):
                dv = int(self.var_dims[lva[plan.perm[pv]]])
                if dv < d:
                    v = np.zeros((d, d))
                    v[np.arange(dv, d), np.arange(dv, d)] = 1.0
                    eye_rows.append(blk_base[c.cid] + i * mb + i)
                    eye_vals.append(v.reshape(-1))
        P = len(eye_rows)
        Pp = padf(max(1, P))
        eye_rows_np = np.full(Pp, trash_blk, dtype=np.int32)
        eye_rows_np[:P] = eye_rows
        eye_vals_np = np.zeros((Pp, dd))
        if P:
            eye_vals_np[:P] = np.stack(eye_vals)

        # ---- extend-add maps ----
        ext_dev = []
        for (bk, Bp) in real_buckets:
            nf, ns = bk.nf, bk.ns
            ext = np.full((Bp, ns, ns), trash_blk, dtype=np.int64)
            extg = np.full((Bp, ns), trash_g, dtype=np.int64)
            for i, cid in enumerate(bk.cliques):
                c = cliques[cid]
                if c.parent >= 0 and c.separator:
                    p = cliques[c.parent]
                    ppos = np.asarray(
                        [cpos(p, v) for v in c.separator], dtype=np.int64
                    )
                    nr = len(c.separator)
                    ext[i, :nr, :nr] = (
                        blk_base[p.cid]
                        + ppos[:, None] * mb_of[p.cid]
                        + ppos[None, :]
                    )
                    extg[i, :nr] = g_base[p.cid] + ppos
            ext_dev.append(
                (up(ext.astype(np.int32)), up(extg.astype(np.int32)))
            )
        for _ in range(n_levels_pad - len(real_buckets)):
            ext_dev.append(
                (up(np.zeros((1, 0, 0), np.int32)),
                 up(np.zeros((1, 0), np.int32)))
            )

        # ---- per-level clique metadata (for CliqueRec construction) ----
        levels_meta = []
        for (bk, Bp) in real_buckets:
            clqs = []
            for cid in bk.cliques:
                c = cliques[cid]
                clqs.append(
                    (
                        c.cid,
                        tuple(int(plan.perm[v]) for v in c.frontal),
                        tuple(int(plan.perm[v]) for v in c.separator),
                        c.parent,
                    )
                )
            levels_meta.append((bk.nf, bk.ns, len(bk.cliques), Bp, clqs))

        return _LocalPlan(
            cfg=(),
            fac=plan_fac,
            msg=plan_msg,
            eye_rows_dev=up(eye_rows_np),
            eye_vals_dev=(
                eye_vals_np.astype(self._npdtype)
                if self._np
                else jnp.asarray(eye_vals_np, dtype=self.dtype)
            ),
            ext_dev=ext_dev,
            levels_meta=levels_meta,
            n_cliques=len(cliques),
            n_blocks=n_blocks,
            n_grows=n_grows,
            lvl_offsets=tuple(lvl_offsets),
        )

    # -- wildfire ---------------------------------------------------------------

    def _wild_round(self, cids: List[int]) -> Dict[int, float]:
        """Back-substitute one frontier of cliques (parents all solved)."""
        d = self.d
        by_cls: Dict[Tuple[int, int], List[int]] = {}
        for cid in cids:
            by_cls.setdefault(self.cliques[cid].cls, []).append(cid)
        changes: Dict[int, float] = {}
        for cls, full_group in sorted(by_cls.items()):
            nf, ns = cls
            pc = None if self._np else self.pools[cls]
            step = (1 << 30) if self._np else _B_CHUNK
            chunks = [
                full_group[s : s + step]
                for s in range(0, len(full_group), step)
            ]
            self._wild_chunks(cls, nf, ns, pc, chunks, changes)
        return changes

    def _wild_chunks(self, cls, nf, ns, pc, chunks, changes):
        d = self.d
        for group in chunks:
            B = len(group) if self._np else _b_class(len(group))
            rows = np.full(B, 0 if self._np else pc.cap, dtype=np.int32)
            sep_idx = np.full((B, ns), self.xcap, dtype=np.int32)
            fro_idx = np.full((B, nf), self.xcap, dtype=np.int32)
            valid = np.zeros(B, dtype=np.float32)
            for i, cid in enumerate(group):
                c = self.cliques[cid]
                rows[i] = c.row
                for si, gid in enumerate(c.separator):
                    sep_idx[i, si] = gid
                for fi, gid in enumerate(c.frontal):
                    fro_idx[i, fi] = gid
                valid[i] = 1.0
            if self._np:
                pays = [self.payloads[cid] for cid in group]
                Lg = np.stack([p.L for p in pays])
                Linvg = np.stack([p.Linv for p in pays])
                Wg = np.stack([p.W for p in pays])
                yg = np.stack([p.y for p in pays])
                if ns > 0:
                    xs = self.x[sep_idx].reshape(B, ns * d)
                    rhs = yg - np.einsum("bfs,bs->bf", Wg, xs)
                else:
                    rhs = yg
                xf = kernels_np.backsolve_bucket(Lg, Linvg, rhs, nf, d)
                xold = self.x[fro_idx].reshape(B, nf * d)
                chg = np.max(np.abs(xf - xold), axis=1) * valid
                self.x[fro_idx.reshape(-1)] = xf.reshape(B * nf, d)
                self.x[self.xcap] = 0.0
            else:
                fn = _wild_jit(B, nf, ns, d, pc.cap, self.xcap)
                self.x, chg = fn(
                    pc.arrays,
                    jnp.asarray(rows),
                    jnp.asarray(sep_idx),
                    jnp.asarray(fro_idx),
                    jnp.asarray(valid, dtype=self.dtype),
                    self.x,
                )
                chg = np.asarray(chg)
            for i, cid in enumerate(group):
                changes[cid] = float(chg[i])

    def _wildfire(self, new_by_level: List[List[int]], threshold: float) -> int:
        """Frontier descent: new cliques top-down (forced), then into old
        subtrees while the separator delta keeps changing by > threshold
        (ISAM2Clique::optimizeWildfireNode semantics)."""
        if self._nat is not None:
            seeds = [
                self.cliques[cid].nslot
                for lv in new_by_level
                for cid in lv
            ]
            return self._nat.sweep(self.x, self.xcap, seeds, threshold)
        dirty: Set[int] = set()
        new_set = {cid for lv in new_by_level for cid in lv}
        n_rounds = 0
        candidates: List[int] = []
        for lv_cids in reversed(new_by_level):  # top level last in plan order
            if not lv_cids:
                continue
            changes = self._wild_round(lv_cids)
            n_rounds += 1
            for cid, chg in changes.items():
                if chg > threshold:
                    dirty.update(self.cliques[cid].frontal)
                for ch in self.cliques[cid].children:
                    if ch not in new_set:
                        candidates.append(ch)
        frontier = [
            ch
            for ch in dict.fromkeys(candidates)
            if any(v in dirty for v in self.cliques[ch].separator)
        ]
        while frontier:
            changes = self._wild_round(frontier)
            n_rounds += 1
            nxt: List[int] = []
            for cid, chg in changes.items():
                if chg > threshold:
                    dirty.update(self.cliques[cid].frontal)
            for cid in frontier:
                for ch in self.cliques[cid].children:
                    if any(v in dirty for v in self.cliques[ch].separator):
                        nxt.append(ch)
            frontier = nxt
        return n_rounds

    # -- delta access -------------------------------------------------------------

    def x_snapshot(self):
        """The delta array in a form safe to hand to a jitted function.

        jax on CPU ZERO-COPY aliases float64 numpy arrays, and the numpy
        backend mutates x in place (zero_delta_rows, the native wildfire
        sweep's pointer writes) — an async jit dispatched on the raw buffer
        reads post-mutation values (observed as hash-seed-dependent test
        flakiness). Snapshot for the numpy backend; the jax backend's x is
        an immutable device array already."""
        return self.x.copy() if self._np else self.x

    def delta_rows(self, gids: np.ndarray, dim: int) -> jnp.ndarray:
        """Gather delta rows [len(gids), dim] for a set of variables."""
        return self.x[jnp.asarray(np.asarray(gids, dtype=np.int32)), :dim]

    def zero_delta_rows(self, gids):
        if self._np:
            self.x[np.asarray(gids, dtype=np.int32)] = 0.0
            return
        # shape-padded (pads hit the trash row, already zero)
        n = len(gids)
        idx = np.full(_pad(max(1, n)), self.xcap, dtype=np.int32)
        idx[:n] = np.asarray(gids, dtype=np.int32)
        self.x = _zero_rows_jit(self.x.shape[0], idx.shape[0])(
            self.x, jnp.asarray(idx)
        )

    def var_max_delta(self) -> np.ndarray:
        """max|delta| per gid (for relinearization marking).

        Computed over the full capacity-padded x so the jitted reduction's
        shape is stable across variable growth (no per-step recompiles);
        rows beyond n are zero."""
        if self._np:
            return np.max(np.abs(self.x[: self.n]), axis=1)
        md = np.asarray(_max_abs_jit(self.x.shape[0])(self.x))
        return md[: self.n]

    # -- marginalization ------------------------------------------------------------

    def marginalize_leaves(
        self, gids: Sequence[int], keep_messages: bool = True
    ) -> List[Tuple[int, int]]:
        """Marginalize variables out of the tree (ISAM2::marginalizeLeaves,
        gtsam/nonlinear/ISAM2.cpp:487-724). Returns the retired (group, row)
        factor units whose information was absorbed into marginal factors.

        Two phases: (1) an update() with the marginalized vars constrained
        FIRST and supernode merging barred across the marg/live boundary, so
        afterwards every marg var is frontal in a leaf-most, pure-marg clique;
        (2) those cliques are deleted and their cached separator messages
        (U, ug) become persistent marginal factors on the live separator —
        the LinearContainerFactor analog."""
        gids = [g for g in gids if self.var_clique.get(g) is not None]
        if not gids:
            return []
        gset = set(gids)
        self.update(marked=gset, relin=gset, first=gids)

        # collect pure-marg cliques (leaf-most by construction)
        dead: List[CliqueRec] = []
        for g in gids:
            cid = self.var_clique.get(g)
            if cid is None:
                continue
            c = self.cliques[cid]
            if not all(v in gset for v in c.frontal):
                raise RuntimeError(
                    f"marginalize_leaves: clique {cid} mixes live vars "
                    f"{[v for v in c.frontal if v not in gset]}"
                )
            if c not in dead:
                dead.append(c)
        dead_cids = {c.cid for c in dead}
        for c in dead:
            if any(
                ch not in dead_cids
                and self.cliques[ch] is not None
                and self.cliques[ch].alive
                for ch in c.children
            ):
                raise RuntimeError("marginalize_leaves: clique has live children")

        all_retired: List[Tuple[int, int]] = []
        # convert each dead clique's message into a persistent marginal
        # factor — only for the TOP-most marg cliques (all-live separator);
        # lower marg cliques' messages already flowed into their (also-dead)
        # parents during the phase-1 elimination.
        for c in dead:
            live_scope = list(c.separator)
            nsc = c.cls[1]
            if keep_messages and live_scope and not any(
                v in gset for v in live_scope
            ):
                mid = len(self.msgs)
                if self._np:
                    r = -1
                    pay = self.payloads[c.cid]
                    self.msg_payloads[mid] = (pay.U.copy(), pay.ug.copy())
                else:
                    mp = self.msg_pools.get(nsc)
                    if mp is None:
                        mp = PoolClass(
                            0, nsc, 0,
                            _make_pool(0, nsc, self.d, 0, self.dtype, False),
                        )
                        self.msg_pools[nsc] = mp
                    r = mp.alloc()
                    while r < 0:
                        self.msg_pools[nsc] = mp = _grow_pool(
                            mp, self.d, self.dtype, False
                        )
                        r = mp.alloc()
                    src = self.pools[c.cls]
                    U2, ug2 = _copy_msg_jit(nsc, self.d, src.cap, mp.cap)(
                        mp.arrays.U, mp.arrays.ug,
                        jnp.asarray(np.asarray([r], np.int32)),
                        src.arrays.U, src.arrays.ug,
                        jnp.asarray(np.asarray([c.row], np.int32)),
                    )
                    mp.arrays = mp.arrays._replace(U=U2, ug=ug2)
                self.msgs.append(MsgRec(mid=mid, ns=nsc, row=r, scope=live_scope))
                # owner: the live clique where the first separator var is frontal
                owner = self.var_clique[live_scope[0]]
                self.msgs[mid].alive = True
                self.cliques[owner].owned_msg.append(mid)
            # unlink + free; retire the factors and messages this clique
            # owned — their information now lives in the marginal factor
            if c.parent >= 0 and self.cliques[c.parent] is not None:
                self.cliques[c.parent].children.discard(c.cid)
            if self._np:
                if self._nat is not None:
                    self._nat.on_free(c)
                self.payloads.pop(c.cid, None)
            else:
                self.pools[c.cls].free.append(c.row)
            for gid in c.frontal:
                self.var_clique.pop(gid, None)
            retired = set(c.owned_fac)
            all_retired.extend(c.owned_fac)
            for (g, r) in c.owned_fac:
                for k in range(self.groups[g].K):
                    gid = int(self.groups[g].keys[r, k])
                    lst = self.var_factors.get(gid)
                    if lst:
                        self.var_factors[gid] = [u for u in lst if u not in retired]
            for mid in c.owned_msg:
                self.msgs[mid].alive = False
            self.cliques[c.cid] = None
            self.n_live -= 1
        # tombstone the variables (their x rows stay zero)
        self.zero_delta_rows(list(gset))
        return all_retired
