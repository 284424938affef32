"""Full GN step timing: blocking per-call AND pipelined (10 chained)."""
import sys, time, numpy as np, jax, jax.numpy as jnp
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.slam.factors import prior_factor
from gtsam_petercdev_tpu.utils import dataset
from gtsam_petercdev_tpu.geometry import pose3
from gtsam_petercdev_tpu.inference import elimination

mbpl = int(sys.argv[1]) if len(sys.argv) > 1 else 2
path = dataset.find_example_data("sphere2500.txt")
graph, values = dataset.read_g2o(path, is3D=True, dtype=np.float32)
graph.add(prior_factor("Pose3"), [0], pose3.identity(jnp.float32),
          noise.diagonal_precisions(np.asarray([1e6]*3+[1e4]*3, dtype=np.float32)))
graph._materialize()
structure = elimination.graph_structure(graph, values)
plan = elimination.build_plan_for_graph(structure, len(values), 6, max_buckets_per_level=mbpl)
maps = elimination.build_numeric_maps(plan, structure)
print(f"mbpl={mbpl} buckets={sum(len(l) for l in plan.levels)} pool={maps.n_blocks}", flush=True)

@jax.jit
def gn_step(values_in):
    lg = graph.linearize(values_in)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x = elimination._multifrontal_solve_impl(maps, Ab, 1e-5)
    return values_in.retract({"Pose3": x})

t0 = time.perf_counter()
out = gn_step(values); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
ct = time.perf_counter()-t0
# pipelined: chain 10, block once
for trial in range(3):
    cur = values
    t0 = time.perf_counter()
    for _ in range(10):
        cur = gn_step(cur)
    jax.block_until_ready(jax.tree_util.tree_leaves(cur)[0])
    print(f"pipelined: {(time.perf_counter()-t0)*100:.1f} ms/iter", flush=True)
print(f"(compile {ct:.0f}s)", flush=True)
