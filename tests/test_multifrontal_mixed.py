"""Mixed-dimension multifrontal proof: BA (Pose3+Cal+Point3) and VIO
(Pose3+Vel3+Bias6) graphs through the sparse supernodal path must match the
dense normal-equation solve (the Scatter/variable-size-block semantics of
gtsam/linear/Scatter.h:49, realized here as d_max padding with identity
pinning on fake dims)."""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.inference import elimination
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.models.bundle_adjustment import build_ba_graph
from gtsam_petercdev_tpu.navigation import preintegration as pre
from gtsam_petercdev_tpu.navigation.factors import imu_factor, velocity_prior
from gtsam_petercdev_tpu.navigation.navstate import NavState
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import LMParams, levenberg_marquardt
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.sfm.bal import read_bal
from gtsam_petercdev_tpu.slam.factors import prior_factor

BAL_FILE = "/root/reference/examples/Data/dubrovnik-3-7-pre.txt"


def _mf_delta(graph, values, lam, dd=False):
    elimination.clear_plan_cache()
    delta, _ = elimination.solve_linearized(
        graph, values, lam, diagonal_damping=dd, cache={}
    )
    return delta


def test_ba_multifrontal_matches_dense():
    """dubrovnik BAL through solver='multifrontal' == dense to 1e-8."""
    data = read_bal(BAL_FILE)
    graph, values = build_ba_graph(data)
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    for lam, dd in ((1e-3, False), (0.5, True)):
        x = linsolve.dense_solve(H, g, lam, diagonal_damping=dd)
        want = linsolve.unflatten_delta(lg, x)
        got = _mf_delta(graph, values, lam, dd)
        for t in want:
            np.testing.assert_allclose(
                np.asarray(got[t]), np.asarray(want[t]), atol=1e-8,
                err_msg=f"type {t} lam {lam}",
            )


def test_ba_lm_with_multifrontal_solver():
    data = read_bal(BAL_FILE)
    graph, values = build_ba_graph(data)
    res = levenberg_marquardt(
        graph, values, LMParams(max_iterations=25, solver="multifrontal")
    )
    assert res.error < 0.5


def _vio_chain(n_states=6):
    """Pose3 + Vector3 velocity + ConstantBias chain with IMU factors."""
    dtype = jnp.float64
    params = pre.default_params(dtype=dtype)
    rng = np.random.default_rng(7)
    dt = 1e-2
    steps = 20
    acc = np.tile(np.asarray([0.3, 0.0, -9.81]), (steps, 1))
    om = np.tile(np.asarray([0.0, 0.0, 0.3]), (steps, 1))
    dts = np.full(steps, dt)

    X, V, B = 0, 100, 200
    graph = NonlinearFactorGraph()
    values = Values()
    state = NavState(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
                     jnp.zeros(3, dtype=dtype))
    values.insert(X + 0, "Pose3", Pose3(state.R, state.t))
    values.insert(V + 0, "Vector3", state.v)
    values.insert(B + 0, "ConstantBias", jnp.zeros(6, dtype=dtype))
    graph.add(prior_factor("Pose3"), [X + 0], Pose3(state.R, state.t),
              noise.isotropic(6, 1e-4, dtype))
    graph.add(velocity_prior(), [V + 0], state.v, noise.isotropic(3, 1e-4, dtype))
    graph.add(prior_factor("ConstantBias"), [B + 0],
              jnp.zeros(6, dtype=dtype), noise.isotropic(6, 1e-3, dtype))
    for i in range(n_states - 1):
        pim = pre.preintegrate(params, jnp.asarray(acc), jnp.asarray(om),
                               jnp.asarray(dts))
        nxt = pre.predict(pim, params, state, jnp.zeros(6, dtype=dtype))
        values.insert(
            X + i + 1, "Pose3",
            pose3.retract(Pose3(nxt.R, nxt.t),
                          jnp.asarray(rng.normal(size=6) * 0.03)),
        )
        values.insert(V + i + 1, "Vector3",
                      nxt.v + jnp.asarray(rng.normal(size=3) * 0.03))
        sqrt_info = noise.gaussian_covariance(
            np.asarray(pim.cov) + 1e-10 * np.eye(9)
        )
        graph.add(
            imu_factor(), [X + i, V + i, X + i + 1, V + i + 1, B + 0],
            {"pim": pim, "n_gravity": params.n_gravity}, sqrt_info,
        )
        state = nxt
    return graph, values


def test_vio_multifrontal_matches_dense():
    """Pose3(6)+Vector3(3)+ConstantBias(6) IMU chain through the sparse
    path == dense to 1e-8 (mixed dims 6/3/6 in one elimination)."""
    graph, values = _vio_chain()
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    for lam in (1e-4, 1e-1):
        x = linsolve.dense_solve(H, g, lam)
        want = linsolve.unflatten_delta(lg, x)
        got = _mf_delta(graph, values, lam)
        for t in want:
            np.testing.assert_allclose(
                np.asarray(got[t]), np.asarray(want[t]), atol=1e-8,
                err_msg=f"type {t} lam {lam}",
            )


def test_synthetic_ba_multifrontal_sparse(rng):
    """Larger synthetic BA (20 cams, 60 points) exercises real sparsity in
    the mixed-dim plan; multifrontal == dense."""
    from gtsam_petercdev_tpu.geometry import cal3, cameras
    from gtsam_petercdev_tpu.slam.projection import projection_factor_s2

    n_cams, n_pts = 20, 60
    dtype = jnp.float64
    K = cal3.cal3_s2(500.0, 500.0, 0.0, 320.0, 240.0, dtype=dtype)
    pts = rng.uniform(-2, 2, size=(n_pts, 3)) + np.asarray([0, 0, 8.0])
    graph = NonlinearFactorGraph()
    values = Values()
    for i in range(n_cams):
        t = jnp.asarray([3.0 * np.cos(i / 3), 3.0 * np.sin(i / 3), 0.0],
                        dtype=dtype)
        pose = Pose3(jnp.eye(3, dtype=dtype), t)
        values.insert(i, "Pose3", pose3.retract(
            pose, jnp.asarray(rng.normal(size=6) * 0.01)))
    for j in range(n_pts):
        values.insert(1000 + j, "Point3",
                      jnp.asarray(pts[j] + rng.normal(size=3) * 0.05))
    m = noise.isotropic(2, 1.0, dtype)
    for i in range(n_cams):
        pose = values.at(i)
        for j in range(n_pts):
            if (i + j) % 3:  # sparsify observations
                continue
            uv, _ = cameras.project_s2(pose, jnp.asarray(pts[j]), K)
            graph.add(projection_factor_s2(), [i, 1000 + j],
                      {"uv": uv, "K": K}, m)
    lg = graph.linearize(values)
    H, g = linsolve.assemble_dense(lg)
    x = linsolve.dense_solve(H, g, 1e-3)
    want = linsolve.unflatten_delta(lg, x)
    got = _mf_delta(graph, values, 1e-3)
    for t in want:
        np.testing.assert_allclose(
            np.asarray(got[t]), np.asarray(want[t]), atol=1e-7
        )
