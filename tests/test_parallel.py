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
