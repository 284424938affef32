"""Profile the sphere2500 multifrontal GN iteration phase by phase (TPU)."""
import json, time, sys
import numpy as np
import jax, jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.slam.factors import prior_factor
from gtsam_petercdev_tpu.utils import dataset
from gtsam_petercdev_tpu.geometry import pose3
from gtsam_petercdev_tpu.inference import elimination

path = dataset.find_example_data("sphere2500.txt")
graph, values = dataset.read_g2o(path, is3D=True, dtype=np.float32)
graph.add(prior_factor("Pose3"), [0], pose3.identity(jnp.float32),
          noise.diagonal_precisions(jnp.asarray([1e6]*3 + [1e4]*3, dtype=jnp.float32)))
graph._materialize()

t0 = time.perf_counter()
structure = elimination.graph_structure(graph, values)
plan = elimination.build_plan_for_graph(
    [(rows, t[0]) for (t, rows) in structure], len(values), 6)
maps = elimination.build_numeric_maps(plan, structure)
print(f"plan build: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

# plan stats
nlv = len(plan.levels)
buckets = [(len(lv), sum(len(b.cliques) for b in lv),
            [(b.nf, b.ns, len(b.cliques)) for b in lv]) for lv in plan.levels]
print(f"levels: {nlv}", file=sys.stderr)
tot_buckets = sum(len(lv) for lv in plan.levels)
tot_cliques = len(plan.cliques)
print(f"total buckets: {tot_buckets}, cliques: {tot_cliques}, F_size {plan.F_size}", file=sys.stderr)
for li, (nb, nc, shapes) in enumerate(buckets[:50]):
    print(f"  lv{li}: {nb} buckets {nc} cliques {shapes[:8]}", file=sys.stderr)

def timeit(f, *a):
    o = f(*a); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = f(*a); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        ts.append((time.perf_counter()-t0)*1e3)
    return float(np.median(ts)), o

lg = graph.linearize(values)
Ab = tuple((lb.A, lb.b) for lb in lg.batches)
Ab = jax.tree_util.tree_map(jnp.asarray, Ab)

lin_t, lg2 = timeit(jax.jit(lambda v: graph.linearize(v)), values)
print(f"linearize: {lin_t:.1f}ms", file=sys.stderr)

full_t, _ = timeit(jax.jit(lambda ab: elimination.multifrontal_solve(maps, ab, 1e-5)), Ab)
print(f"multifrontal_solve: {full_t:.1f}ms", file=sys.stderr)

# assembly only
def assemble(Ab):
    d = plan.d
    dtype = Ab[0][1].dtype
    F = jnp.zeros((plan.F_size,), dtype=dtype)
    gv = jnp.zeros((plan.g_size,), dtype=dtype)
    for (bi, k, l, idx) in maps.fac_F_idx:
        A, b = Ab[bi]
        blk = jnp.einsum("ndi,ndj->nij", A[k], A[l])
        F = F.at[jnp.asarray(idx)].add(blk)
    for (bi, k, idx) in maps.fac_g_idx:
        A, b = Ab[bi]
        gv = gv.at[jnp.asarray(idx)].add(jnp.einsum("ndk,nd->nk", A[k], b))
    F = F.at[jnp.asarray(maps.pad_diag_idx)].add(1.0)
    return F, gv

asm_t, (F, gv) = timeit(jax.jit(assemble), Ab)
print(f"assembly: {asm_t:.1f}ms", file=sys.stderr)

# elimination sweep only (bottom-up), given F, gv
def sweep(F, gv):
    d = plan.d
    outs = []
    for li, lv in enumerate(plan.levels):
        for bi, bk in enumerate(lv):
            fd, sd = bk.nf * d, bk.ns * d
            Fm = F[jnp.asarray(maps.F_gather[li][bi])]
            gm = gv[jnp.asarray(maps.g_gather[li][bi])]
            F11 = Fm[:, :fd, :fd]
            L11 = jnp.linalg.cholesky(F11)
            y = jax.scipy.linalg.solve_triangular(L11, gm[:, :fd, None], lower=True)[..., 0]
            if sd > 0:
                W = jax.scipy.linalg.solve_triangular(L11, Fm[:, :fd, fd:], lower=True)
                U = Fm[:, fd:, fd:] - jnp.einsum("bkf,bkg->bfg", W, W)
                ug = gm[:, fd:] - jnp.einsum("bkf,bk->bf", W, y)
                F = F.at[jnp.asarray(maps.ext_F_dst[li][bi])].add(U)
                gv = gv.at[jnp.asarray(maps.ext_g_dst[li][bi])].add(ug)
            outs.append(jnp.sum(y))
    return sum(outs)

sw_t, _ = timeit(jax.jit(sweep), F, gv)
print(f"bottom-up sweep: {sw_t:.1f}ms", file=sys.stderr)
