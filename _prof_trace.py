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

@jax.jit
def gn_step(values_in):
    lg = graph.linearize(values_in)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x = elimination._multifrontal_solve_impl(maps, Ab, 1e-5)
    return values_in.retract({"Pose3": x})

out = gn_step(values); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        out = gn_step(out)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
print("trace done", flush=True)
