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
          noise.diagonal_precisions(np.asarray([1e6]*3 + [1e4]*3, dtype=np.float32)))
graph._materialize()

t0 = time.perf_counter()
structure = elimination.graph_structure(graph, values)
plan = elimination.build_plan_for_graph(structure, len(values), 6)
maps = elimination.build_numeric_maps(plan, structure)
print(f"plan build: {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)

# plan stats
nlv = len(plan.levels)
buckets = [(len(lv), sum(len(b.cliques) for b in lv),
            [(b.nf, b.ns, len(b.cliques)) for b in lv]) for lv in plan.levels]
tot_buckets = sum(len(lv) for lv in plan.levels)
print(f"levels: {nlv}, buckets: {tot_buckets}, cliques: {len(plan.cliques)}, "
      f"pool blocks {maps.n_blocks} ({maps.n_blocks*36*4/1e6:.0f} MB f32)",
      file=sys.stderr, flush=True)
for li, (nb, nc, shapes) in enumerate(buckets):
    print(f"  lv{li}: {nb} buckets {nc} cliques {shapes[:8]}", file=sys.stderr, flush=True)


def timeit(name, f, *a):
    t0 = time.perf_counter()
    o = f(*a); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    compile_t = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = f(*a); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"{name}: {np.median(ts):.1f}ms (compile {compile_t:.1f}s)",
          file=sys.stderr, flush=True)
    return o


lin_fn = jax.jit(lambda v: tuple((lb.A, lb.b) for lb in graph.linearize(v).batches))
Ab = timeit("linearize", lin_fn, values)

asm_fn = jax.jit(lambda ab: elimination.assemble(maps, ab, 1e-5, False))
pool_gp = timeit("assemble", asm_fn, Ab)

solve_fn = jax.jit(lambda ab: elimination._multifrontal_solve_impl(maps, ab, 1e-5))
x = timeit("solve (assemble+sweeps)", solve_fn, Ab)

ret_fn = jax.jit(lambda v, xx: v.retract({"Pose3": xx}))
timeit("retract", ret_fn, values, x)


@jax.jit
def gn_step(v):
    lg = graph.linearize(v)
    ab = tuple((lb.A, lb.b) for lb in lg.batches)
    xx = elimination._multifrontal_solve_impl(maps, ab, 1e-5)
    return v.retract({"Pose3": xx})


timeit("full GN step", gn_step, values)
err_fn = jax.jit(lambda v: graph.error(v))
cur = values
for i in range(6):
    cur = gn_step(cur)
print("errors:", float(err_fn(values)), "->", float(err_fn(cur)),
      file=sys.stderr, flush=True)
