import time, sys, numpy as np, jax, jax.numpy as jnp
from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.inference import elimination
from gtsam_petercdev_tpu.models.ba_synth import make_synthetic_ba
from gtsam_petercdev_tpu.models.bundle_adjustment import build_ba_graph

t0=time.time()
data = make_synthetic_ba(1000, 50_000, 4, dtype=jnp.float32)
print(f"synth: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
graph, values = build_ba_graph(data, dtype=jnp.float32)
graph._materialize()
print(f"graph: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
lg = graph.linearize(values)
print(f"linearize trace: {time.time()-t0:.1f}s", flush=True)
types = sorted(lg.type_counts); dims = {t: manifold.get(t).dim for t in types}
d = max(dims.values()); offs, off = {}, 0
for t in types: offs[t] = off; off += lg.type_counts[t]
structure = [elimination.BatchStructure(tuple(dims[t] for t in lb.var_types),
    tuple(np.asarray(r, np.int64) + offs[t] for r, t in zip(lb.rows, lb.var_types)), lb.sign)
    for lb in lg.batches]
var_dims = np.full(off, d, dtype=np.int64)
for t in types: var_dims[offs[t]: offs[t]+lg.type_counts[t]] = dims[t]
t0=time.time()
plan = elimination.build_plan_for_graph(structure, off, d, max_buckets_per_level=4)
print(f"symbolic plan: {time.time()-t0:.1f}s levels={len(plan.levels)} cliques={len(plan.cliques)}", flush=True)
t0=time.time()
maps = elimination.build_numeric_maps(plan, structure, var_dims=var_dims)
print(f"numeric maps: {time.time()-t0:.1f}s pool={maps.n_blocks} ublocks={maps.n_ublocks}", flush=True)
print(f"pool GB f32: {maps.n_blocks*81*4/1e9:.2f}", flush=True)
