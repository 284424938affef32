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


def _ba_structures(n_cams=None, n_points=None, obs=3):
    if n_cams is None:
        n_cams = int(os.environ.get("SCALING_BA_CAMS", 200))
    if n_points is None:
        n_points = int(os.environ.get("SCALING_BA_PTS", 10_000))
    """Build the ba_synth mixed-dim problem (SfmCamera d=9, Point3 d=3) in
    the partitioned-solver's structure/Ab form. Returns
    (graph, values, structure, Ab, var_dims, offs, dims, types, n)."""
    import jax.numpy as jnp
    import numpy as np

    from gtsam_petercdev_tpu.core import manifold
    from gtsam_petercdev_tpu.models.ba_synth import make_synthetic_ba
    from gtsam_petercdev_tpu.models.bundle_adjustment import build_ba_graph

    data = make_synthetic_ba(n_cams, n_points, obs, dtype=jnp.float64)
    graph, values = build_ba_graph(data, dtype=jnp.float64)
    lg = graph.linearize(values)
    types = sorted(lg.type_counts)
    dims = {t: manifold.get(t).dim for t in types}
    offs, off = {}, 0
    for t in types:
        offs[t] = off
        off += lg.type_counts[t]
    n = off
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
    var_dims = np.full(n, max(dims.values()), np.int64)
    for t in types:
        var_dims[offs[t] : offs[t] + lg.type_counts[t]] = dims[t]
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    return graph, values, structure, Ab, var_dims, offs, dims, types, n


def _ba_worker(n_dev: int):
    """Partitioned BA solve on the virtual mesh via uniform d=3 sub-blocks
    (cameras split into three d=3 blocks; Point3 native) — no Point3-in-d9
    padding. Reports solve time, equivalence vs the single-device mixed-dim
    multifrontal, and per-device padded FLOPs; the N=1 worker also builds
    the legacy d=9-padded plan for the padding-waste comparison."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np
    from jax.sharding import Mesh

    from gtsam_petercdev_tpu.inference import elimination
    from gtsam_petercdev_tpu.parallel import partition as pt

    assert len(jax.devices()) >= n_dev
    (graph, values, structure, Ab, var_dims, offs, dims, types, n) = (
        _ba_structures()
    )
    lam = 1e-3
    out = {"n_dev": n_dev, "n": n}

    if n_dev == 1:
        delta, _ = elimination.solve_linearized(graph, values, lam, cache={})
        xr = np.zeros((n, int(var_dims.max())))
        for t in types:
            dt = np.asarray(delta[t])
            xr[offs[t] : offs[t] + dt.shape[0], : dims[t]] = dt
        np.save("/tmp/scaling_ba_xref.npy", xr)
        # d9-padded FLOP contrast from the symbolic planner (the full
        # d9-padded partitioned plan does not even fit: its block pool
        # overflows int32 indices at this scale — the padding cost in one
        # sentence)
        from gtsam_petercdev_tpu.inference.symbolic import (
            symbolic_eliminate,
        )

        fvars = [np.asarray(ent["keys"], np.int64) for ent in structure]
        d9 = int(var_dims.max())
        p9 = symbolic_eliminate(n, fvars, d9)
        st9 = elimination.plan_flop_stats(p9, var_dims)
        out["d9_flops"] = {
            "interior_gflops_per_device": st9["padded_gflops"],
            "separator_gflops_replicated": 0.0,
            "native_gflops": st9["native_gflops"],
        }
    x_ref = np.load("/tmp/scaling_ba_xref.npy")

    sub_structure, sub_base, n_sub = pt.split_structure_to_blocks(
        structure, var_dims, 3
    )
    sub_Ab = pt.split_Ab_to_blocks(Ab, structure, 3)
    plan = pt.build_partitioned_plan(sub_structure, n_sub, 3, n_dev)
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("parts",))
    solver = pt.PartitionedSolver(plan, mesh)
    x = pt.merge_block_solution(
        solver.solve(sub_Ab, lam), sub_base, var_dims, 3
    )
    err = float(np.abs(x - x_ref).max())
    assert err < 1e-6, err
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        solver.solve(sub_Ab, lam)
        ts.append(time.perf_counter() - t0)
    out.update(
        S=int(plan.S),
        n_sub=n_sub,
        max_abs_diff_vs_single=err,
        partitioned_ms=round(1e3 * float(np.median(ts)), 1),
        d3_flops=pt.plan_padded_flops(plan),
    )
    print("SCALING " + json.dumps(out), flush=True)


def _ba_main():
    results = []
    for n_dev in (1, 2, 4):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n_dev}"
        )
        p = subprocess.run(
            [sys.executable, "-m", "gtsam_petercdev_tpu.parallel.scaling",
             "--ba", "--worker", str(n_dev)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("SCALING ")]
        if not line:
            print(f"BA worker N={n_dev} FAILED:\n{p.stdout[-3000:]}\n"
                  f"{p.stderr[-3000:]}")
            sys.exit(1)
        rec = json.loads(line[0][len("SCALING "):])
        results.append(rec)
        print(rec, flush=True)

    t1 = results[0]["partitioned_ms"]
    d9 = results[0]["d9_flops"]
    lines = [
        "",
        "## Partitioned BA (ba_synth 200 cams / 10k pts / 30k obs), mixed dims",
        "",
        "Cameras (d=9) are split into three d=3 sub-blocks and Point3 stays",
        "native d=3 (`split_structure_to_blocks`), so the uniform-block",
        "partitioned planner pays NO Point3-in-d9 padding. Equivalence vs",
        "the single-device mixed-dim multifrontal solve asserted <= 1e-6",
        "per row. FLOPs are computed from the padded level signatures",
        "(plan_padded_flops): every device runs the same padded program.",
        "",
        "| N devices | separator (d3 blocks) | solve ms | efficiency vs N=1 |"
        " per-device padded GFLOP | max abs diff |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        n_dev = r["n_dev"]
        t = r["partitioned_ms"]
        eff = t1 / (n_dev * t)
        lines.append(
            f"| {n_dev} | {r['S']} | {t} | {eff * 100:.0f}% | "
            f"{r['d3_flops']['interior_gflops_per_device']:.2f} (+"
            f"{r['d3_flops']['separator_gflops_replicated']:.2f} sep) | "
            f"{r['max_abs_diff_vs_single']:.1e} |"
        )
    d3_1 = results[0]["d3_flops"]["interior_gflops_per_device"]
    lines += [
        "",
        f"Padding-waste contrast at N=1: legacy d=9-padded plan "
        f"{d9['interior_gflops_per_device']:.2f} GFLOP vs d=3 sub-block "
        f"plan {d3_1:.2f} GFLOP — "
        f"{d9['interior_gflops_per_device'] / max(d3_1, 1e-9):.1f}x "
        "padded-FLOP reduction from eliminating Point3-in-d9 padding.",
    ]
    # sphere2500 per-device padded FLOPs per mesh size (plan-only, no
    # timing rerun): makes the r4 table's efficiency column auditable —
    # per-part padded level signatures GROW with part count, so per-device
    # work does not fall 1/N (VERDICT r4 weak#7)
    sph = _sphere_flops_table()
    lines2 = [
        "",
        "### sphere2500 per-device padded FLOPs vs mesh size (plan-derived)",
        "",
        "| N devices | separator | per-device padded GFLOP | sep GFLOP (replicated) |",
        "|---|---|---|---|",
    ] + sph
    with open(os.path.join(os.path.dirname(__file__), "..", "..",
                           "SCALING.md"), "a") as f:
        f.write("\n".join(lines + lines2) + "\n")
    print("appended BA section + sphere FLOPs table to SCALING.md")


def _sphere_flops_table():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from gtsam_petercdev_tpu.parallel import partition as pt
    from gtsam_petercdev_tpu.nonlinear.factor_graph import (  # noqa: F401
        NonlinearFactorGraph,
    )
    from gtsam_petercdev_tpu.utils import dataset

    graph, values = dataset.read_g2o(
        dataset.find_example_data("sphere2500.txt"), is3D=True,
        dtype=np.float64,
    )
    graph._materialize()
    from gtsam_petercdev_tpu.inference import elimination

    structure = elimination.graph_structure(graph, values)
    pstruct = [
        {
            "keys": np.stack([np.asarray(g, np.int64) for g in ent.gids],
                             axis=1),
            "dims": ent.dims,
        }
        for ent in structure
    ]
    n = len(values)
    rows = []
    for n_dev in (1, 2, 4, 8):
        plan = pt.build_partitioned_plan(pstruct, n, 6, n_dev)
        fl = pt.plan_padded_flops(plan)
        rows.append(
            f"| {n_dev} | {plan.S} | "
            f"{fl['interior_gflops_per_device']:.2f} | "
            f"{fl['separator_gflops_replicated']:.3f} |"
        )
    return rows


def main():
    if "--ba" in sys.argv:
        if "--worker" in sys.argv:
            _ba_worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        else:
            _ba_main()
        return
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
