"""Scaling-efficiency harness for the partitioned SPMD solver.

Measures sphere2500 linear-solve time and frames/s at 1/2/4/8 devices
(virtual CPU mesh via --xla_force_host_platform_device_count; the same code
path drives real TPU meshes) and asserts partitioned == single-device
multifrontal at sphere2500 scale. Run as a module to produce SCALING.md:

    python -m gtsam_petercdev_tpu.parallel.scaling            # driver
    python -m gtsam_petercdev_tpu.parallel.scaling --worker N # one config

North-star metric (BASELINE.md): >= 70% frames/s scaling efficiency at
N >= 2. Reference seed: gtsam_unstable/partition/FindSeparator.h:41.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _worker(n_dev: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:  # persistent cache: reruns skip the XLA:CPU compiles
        jax.config.update(
            "jax_compilation_cache_dir", "/root/repo/.jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from gtsam_petercdev_tpu.core import manifold
    from gtsam_petercdev_tpu.inference import elimination
    from gtsam_petercdev_tpu.linear import noise
    from gtsam_petercdev_tpu.parallel.partition import (
        PartitionedSolver,
        build_partitioned_plan,
    )
    from gtsam_petercdev_tpu.slam.factors import prior_factor
    from gtsam_petercdev_tpu.geometry import pose3
    from gtsam_petercdev_tpu.utils import dataset

    assert len(jax.devices()) >= n_dev, (len(jax.devices()), n_dev)
    path = dataset.find_example_data("sphere2500.txt")
    graph, values = dataset.read_g2o(path, is3D=True, dtype=np.float64)
    graph.add(
        prior_factor("Pose3"), [0], pose3.identity(jnp.float64),
        noise.diagonal_precisions(np.asarray([1e6] * 3 + [1e4] * 3)),
    )
    graph._materialize()
    lg = graph.linearize(values)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    n = len(values)
    d = 6

    out = {"n_dev": n_dev}

    # single-device multifrontal reference (timed only on the N=1 worker)
    structure = elimination.graph_structure(graph, values)
    if n_dev == 1:
        plan = elimination.build_plan_for_graph(structure, n, d)
        maps = elimination.build_numeric_maps(plan, structure)
        x_ref = np.asarray(elimination.multifrontal_solve(maps, Ab, 1e-5))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(elimination.multifrontal_solve(maps, Ab, 1e-5))
            ts.append(time.perf_counter() - t0)
        out["multifrontal_ms"] = round(1e3 * float(np.median(ts)), 1)
        np.save("/tmp/scaling_xref.npy", x_ref)
    x_ref = np.load("/tmp/scaling_xref.npy")

    pstruct = [
        {
            "keys": np.stack([np.asarray(g, np.int64) for g in ent.gids], axis=1),
            "dims": ent.dims,
        }
        for ent in structure
    ]
    pplan = build_partitioned_plan(pstruct, n, d, n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("parts",))
    solver = PartitionedSolver(pplan, mesh)
    x_par = solver.solve(Ab, 1e-5)
    err = float(np.abs(x_par - x_ref).max())
    out["S"] = int(pplan.S)
    out["max_abs_diff_vs_single"] = err
    assert err < 1e-6, f"partitioned != single-device at sphere2500: {err}"
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solver.solve(Ab, 1e-5)
        ts.append(time.perf_counter() - t0)
    out["partitioned_ms"] = round(1e3 * float(np.median(ts)), 1)
    print("SCALING " + json.dumps(out), flush=True)


def main():
    if "--worker" in sys.argv:
        _worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    results = []
    for n_dev in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        )
        p = subprocess.run(
            [sys.executable, "-m", "gtsam_petercdev_tpu.parallel.scaling",
             "--worker", str(n_dev)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("SCALING ")]
        if not line:
            print(f"worker N={n_dev} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            sys.exit(1)
        rec = json.loads(line[0][len("SCALING "):])
        results.append(rec)
        print(rec, flush=True)

    t1 = results[0]["partitioned_ms"]
    mf = results[0].get("multifrontal_ms")
    n_poses = 2500
    lines = [
        "# SCALING — partitioned separator-Schur solver, sphere2500",
        "",
        "Linear solve (damped GN system, f64) on a virtual CPU device mesh",
        "(`--xla_force_host_platform_device_count=N`; the same shard_map",
        "path drives real TPU meshes). Host: 2 physical cores — wall-clock",
        "parallel speedup is capped at 2x, so strong-scaling efficiency is",
        "reported against the N=1 partitioned solve; N=4/8 rows mainly",
        "validate that separator growth, not compute, is the scaling",
        "limiter. Equivalence vs the single-device multifrontal solve is",
        "asserted at <= 1e-6 max-abs on every row.",
        "",
        f"Single-device multifrontal reference: {mf} ms.",
        "",
        "| N devices | separator size | solve ms | frames/s | efficiency vs N=1 |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        n_dev = r["n_dev"]
        t = r["partitioned_ms"]
        eff = t1 / (n_dev * t)
        fps = n_poses / (t / 1e3)
        lines.append(
            f"| {n_dev} | {r['S']} | {t} | {fps:.0f} | {eff * 100:.0f}% |"
        )
    lines += [
        "",
        "Efficiency = T(1) / (N * T(N)) (strong scaling, fixed problem).",
        f"Max |x_partitioned - x_single| over configs: "
        f"{max(r['max_abs_diff_vs_single'] for r in results):.2e}.",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..", "..", "SCALING.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
