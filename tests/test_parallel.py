"""Distributed (multi-device) solve tests on the virtual 8-device CPU mesh.

Correctness strategy mirrors the reference's incremental-vs-batch pattern
(SURVEY §4.7): the partitioned/sharded solve must match the single-device
solve to numerical tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.parallel.mesh import (
    distributed_gn_step,
    distributed_normal_equations,
    make_mesh,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_distributed_normal_equations_match_single_device():
    import __graft_entry__ as ge

    graph, values = ge._toy_pose3_problem(n_poses=10, dtype=jnp.float64)
    mesh = make_mesh(8)
    ne, _ = distributed_normal_equations(graph, values, mesh)
    H_d, g_d = ne(values)
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    np.testing.assert_allclose(np.asarray(H_d), np.asarray(H), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g), atol=1e-9)


def test_distributed_gn_step_reduces_error():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_partitioned_solver_in_lm_matches_dense():
    """solver="partitioned" as a first-class LM linear solver (lambda retry
    included) reaches the dense LM optimum exactly."""
    from gtsam_petercdev_tpu.linear import noise
    from gtsam_petercdev_tpu.nonlinear import optimizers
    from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
    from gtsam_petercdev_tpu.nonlinear.values import Values
    from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
    from gtsam_petercdev_tpu.geometry import pose2

    rng = np.random.default_rng(5)
    n = 20
    g = NonlinearFactorGraph()
    v = Values()
    sig = noise.isotropic(3, 0.05, jnp.float64)
    v.insert(0, "Pose2", jnp.zeros(3))
    g.add(prior_factor("Pose2"), [0], jnp.zeros(3),
          noise.isotropic(3, 0.01, jnp.float64))
    for i in range(n - 1):
        odo = jnp.asarray([1.0, 0.0, 0.3])
        v.insert(i + 1, "Pose2",
                 pose2.compose(v.at(i), odo + rng.normal(size=3) * 0.05))
        g.add(between_factor("Pose2"), [i, i + 1], odo, sig)
    g.add(between_factor("Pose2"), [0, n - 1],
          pose2.between(v.at(0), v.at(n - 1)), sig)

    r_dense = optimizers.levenberg_marquardt(
        g, v, optimizers.LMParams(max_iterations=15)
    )
    r_part = optimizers.levenberg_marquardt(
        g, v,
        optimizers.LMParams(
            max_iterations=15, solver="partitioned", partition_devices=4
        ),
    )
    assert abs(float(r_dense.error) - float(r_part.error)) < 1e-8
