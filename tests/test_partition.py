"""Partitioned separator-Schur solve: partitioned == single-device.

The reference's batch-equivalence strategy (tests/testGaussianISAM2.cpp)
transferred to the distributed path (SURVEY §4.7): the P-device partitioned
solve over the virtual CPU mesh must match the single-device multifrontal
solve to solver precision.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.inference.elimination import (
    BatchStructure,
    build_numeric_maps,
    build_plan_for_graph,
    multifrontal_solve,
)
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.parallel.partition import (
    PartitionedSolver,
    build_partitioned_plan,
    partition_vars,
)
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _grid_problem(W, rng):
    n = W * W
    g = NonlinearFactorGraph()
    v = Values()
    for i in range(n):
        x, y = i % W, i // W
        v.insert(
            i, "Pose2",
            jnp.asarray([x + rng.normal() * 0.05, y + rng.normal() * 0.05,
                         rng.normal() * 0.05]),
        )
    g.add(prior_factor("Pose2"), [0], jnp.zeros(3),
          noise.isotropic(3, 0.01, jnp.float64))
    m = noise.isotropic(3, 0.1, jnp.float64)
    for i in range(n):
        x, y = i % W, i // W
        if x + 1 < W:
            g.add(between_factor("Pose2"), [i, i + 1],
                  jnp.asarray([1.0, 0, 0]), m)
        if y + 1 < W:
            g.add(between_factor("Pose2"), [i, i + W],
                  jnp.asarray([0, 1.0, 0]), m)
    return g, v, n


def test_partition_vars_is_vertex_separator(rng):
    W = 16
    n = W * W
    edges = []
    for i in range(n):
        x, y = i % W, i // W
        if x + 1 < W:
            edges.append((i, i + 1))
        if y + 1 < W:
            edges.append((i, i + W))
    edges = np.asarray(edges, dtype=np.int64)
    interiors, sep = partition_vars(n, edges, 8)
    part_of = np.full(n, -1)
    for p, ints in enumerate(interiors):
        part_of[ints] = p
    # every var accounted for exactly once
    assert sum(len(i) for i in interiors) + len(sep) == n
    # no edge joins two different interiors
    pa, pb = part_of[edges[:, 0]], part_of[edges[:, 1]]
    cross = (pa >= 0) & (pb >= 0) & (pa != pb)
    assert not cross.any()


@pytest.mark.parametrize("n_dev", [2, 8])
def test_partitioned_matches_single_device(rng, n_dev):
    g, v, n = _grid_problem(12, rng)
    lg = g.linearize(v)
    bs = [
        BatchStructure(
            (3,) * len(lb.rows),
            tuple(np.asarray(r, np.int64) for r in lb.rows), 1.0,
        )
        for lb in lg.batches
    ]
    plan = build_plan_for_graph(bs, n, 3)
    maps = build_numeric_maps(plan, bs)
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    x_ref = np.asarray(multifrontal_solve(maps, Ab, 1e-3))

    structure = [
        {"keys": np.stack([np.asarray(r, np.int64) for r in lb.rows], axis=1),
         "dims": (3,) * len(lb.rows)}
        for lb in lg.batches
    ]
    pplan = build_partitioned_plan(structure, n, 3, n_dev)
    assert pplan.S > 0
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("parts",))
    solver = PartitionedSolver(pplan, mesh)
    x_par = solver.solve(Ab, 1e-3)
    np.testing.assert_allclose(x_par, x_ref, atol=1e-8)


def test_partitioned_gn_converges(rng):
    """Full GN loop with the partitioned linear solver reaches the same
    optimum as the dense batch solve."""
    g, v, n = _grid_problem(8, rng)
    structure = None
    mesh = Mesh(np.array(jax.devices()[:4]), ("parts",))
    solver = None
    vals = v
    for it in range(5):
        lg = g.linearize(vals)
        Ab = tuple((lb.A, lb.b) for lb in lg.batches)
        if solver is None:
            structure = [
                {"keys": np.stack(
                    [np.asarray(r, np.int64) for r in lb.rows], axis=1),
                 "dims": (3,) * len(lb.rows)}
                for lb in lg.batches
            ]
            pplan = build_partitioned_plan(structure, n, 3, 4)
            solver = PartitionedSolver(pplan, mesh)
        x = solver.solve(Ab, 0.0)
        vals = vals.retract({"Pose2": jnp.asarray(x)})
    err = float(g.error(vals))

    from gtsam_petercdev_tpu.nonlinear.optimizers import gauss_newton

    ref = gauss_newton(g, v)
    assert abs(err - float(ref.error)) < 1e-6


def test_subblock_split_ba_matches_multifrontal():
    """Mixed-dim BA (SfmCamera d=9 + Point3 d=3) through the uniform d=3
    sub-block partitioned solve == single-device multifrontal (the
    Point3-in-d9 padding eliminator; gtsam/linear/Scatter.h:49 semantics)."""
    from gtsam_petercdev_tpu.core import manifold
    from gtsam_petercdev_tpu.inference import elimination
    from gtsam_petercdev_tpu.models.ba_synth import make_synthetic_ba
    from gtsam_petercdev_tpu.models.bundle_adjustment import build_ba_graph
    from gtsam_petercdev_tpu.parallel import partition as pt

    data = make_synthetic_ba(
        n_cams=16, n_points=200, obs_per_point=3, dtype=jnp.float64
    )
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
    var_dims = np.full(n, 9, np.int64)
    for t in types:
        var_dims[offs[t] : offs[t] + lg.type_counts[t]] = dims[t]
    Ab = tuple((lb.A, lb.b) for lb in lg.batches)
    lam = 1e-3
    delta, _ = elimination.solve_linearized(graph, values, lam, cache={})

    sub_structure, sub_base, n_sub = pt.split_structure_to_blocks(
        structure, var_dims, 3
    )
    assert n_sub == sum(int(v) // 3 for v in var_dims)
    sub_Ab = pt.split_Ab_to_blocks(Ab, structure, 3)
    n_dev = min(2, len(jax.devices()))
    plan = pt.build_partitioned_plan(sub_structure, n_sub, 3, n_dev)
    solver = PartitionedSolver(
        plan, Mesh(np.array(jax.devices()[:n_dev]), ("parts",))
    )
    x = pt.merge_block_solution(
        solver.solve(sub_Ab, lam), sub_base, var_dims, 3
    )
    for t in types:
        want = np.asarray(delta[t])
        got = x[offs[t] : offs[t] + lg.type_counts[t], : dims[t]]
        np.testing.assert_allclose(got, want, atol=1e-8, err_msg=t)

    fl = pt.plan_padded_flops(plan)
    assert fl["interior_gflops_per_device"] > 0
