"""ISAM2 tests: incremental-vs-batch equivalence (the reference's own core
correctness strategy, tests/testGaussianISAM2.cpp)."""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
from gtsam_petercdev_tpu.nonlinear.optimizers import OptimizerParams, gauss_newton
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _sim_trajectory(n, rng):
    """Odometry chain with loop closures every 7 steps."""
    gt = [jnp.zeros(3, dtype=jnp.float64)]
    odo = []
    for i in range(1, n):
        xi = jnp.asarray([1.0, 0.0, rng.normal() * 0.3])
        gt.append(pose2.compose(gt[-1], xi))
        odo.append(pose2.between(gt[i - 1], gt[i]))
    return gt, odo


def test_incremental_matches_batch(rng):
    n = 25
    gt, odo = _sim_trajectory(n, rng)
    prior_n = noise.isotropic(3, 0.05, jnp.float64)
    odo_n = noise.isotropic(3, 0.1, jnp.float64)

    isam = ISAM2(ISAM2Params(relinearize_threshold=0.01, relinearize_skip=1))
    full_graph = NonlinearFactorGraph()
    full_values = Values()

    for i in range(n):
        nf = NonlinearFactorGraph()
        nv = Values()
        if i == 0:
            nv.insert(0, "Pose2", gt[0])
            nf.add(prior_factor("Pose2"), [0], gt[0], prior_n)
            full_values.insert(0, "Pose2", gt[0])
            full_graph.add(prior_factor("Pose2"), [0], gt[0], prior_n)
        else:
            guess = pose2.compose(
                isam.calculate_estimate().at(i - 1),
                pose2.compose(odo[i - 1], jnp.asarray(rng.normal(size=3) * 0.05)),
            )
            nv.insert(i, "Pose2", guess)
            nf.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
            full_values.insert(i, "Pose2", guess)
            full_graph.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
            if i % 7 == 0 and i >= 7:
                loop_m = pose2.between(gt[i - 7], gt[i])
                nf.add(between_factor("Pose2"), [i - 7, i], loop_m, odo_n)
                full_graph.add(between_factor("Pose2"), [i - 7, i], loop_m, odo_n)
        isam.update(nf, nv)

    # a few empty updates let iSAM2 relinearize to convergence (the reference
    # has the same property: per-step estimates track, equality holds at the
    # fixed point)
    for _ in range(5):
        isam.update()
    est = isam.calculate_estimate()
    # batch: optimize the same graph from the same initial guesses
    batch = gauss_newton(full_graph, full_values, OptimizerParams(max_iterations=50))
    for i in range(n):
        a = np.asarray(est.at(i))
        b = np.asarray(batch.values.at(i))
        np.testing.assert_allclose(a[:2], b[:2], atol=1e-4)
        dth = np.arctan2(np.sin(a[2] - b[2]), np.cos(a[2] - b[2]))
        assert abs(dth) < 1e-4


def test_isam2_error_decreases(rng):
    gt, odo = _sim_trajectory(10, rng)
    isam = ISAM2(ISAM2Params(relinearize_threshold=0.001, relinearize_skip=1))
    nf = NonlinearFactorGraph()
    nv = Values()
    nv.insert(0, "Pose2", gt[0])
    nf.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.1, jnp.float64))
    isam.update(nf, nv)
    for i in range(1, 10):
        nf = NonlinearFactorGraph()
        nv = Values()
        nv.insert(
            i, "Pose2", pose2.compose(gt[i], jnp.asarray(rng.normal(size=3) * 0.2))
        )
        nf.add(
            between_factor("Pose2"),
            [i - 1, i],
            odo[i - 1],
            noise.isotropic(3, 0.1, jnp.float64),
        )
        isam.update(nf, nv)
    for _ in range(4):
        isam.update()  # relinearize to the fixed point
    assert isam.error() < 1e-6


def test_isam2_delta_matches_batch_exact(rng):
    """The reference contract (tests/testGaussianISAM2.cpp): with
    relinearization off and wildfire_threshold=0, the incremental delta after
    every update equals a from-scratch batch solve of the same linearized
    system."""
    from gtsam_petercdev_tpu.linear import solve as linsolve

    n = 30
    gt, odo = _sim_trajectory(n, rng)
    prior_n = noise.isotropic(3, 0.05, jnp.float64)
    odo_n = noise.isotropic(3, 0.1, jnp.float64)
    isam = ISAM2(
        ISAM2Params(enable_relinearization=False, wildfire_threshold=0.0)
    )
    full_graph = NonlinearFactorGraph()
    full_values = Values()

    for i in range(n):
        nf = NonlinearFactorGraph()
        nv = Values()
        if i == 0:
            nv.insert(0, "Pose2", gt[0])
            nf.add(prior_factor("Pose2"), [0], gt[0], prior_n)
            full_values.insert(0, "Pose2", gt[0])
            full_graph.add(prior_factor("Pose2"), [0], gt[0], prior_n)
        else:
            guess = pose2.compose(gt[i], jnp.asarray(rng.normal(size=3) * 0.1))
            nv.insert(i, "Pose2", guess)
            nf.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
            full_values.insert(i, "Pose2", guess)
            full_graph.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
            if i % 5 == 0 and i >= 10:
                loop_m = pose2.between(gt[i - 10], gt[i])
                nf.add(between_factor("Pose2"), [i - 10, i], loop_m, odo_n)
                full_graph.add(
                    between_factor("Pose2"), [i - 10, i], loop_m, odo_n
                )
        isam.update(nf, nv)

        if i % 6 == 0 or i == n - 1:
            lg = full_graph.linearize(full_values)
            H, g = linsolve.assemble_dense(lg)
            xb = np.asarray(linsolve.dense_solve(H, g, 0.0)).reshape(-1, 3)
            xi = np.asarray(isam.delta()["Pose2"])
            np.testing.assert_allclose(xi, xb, atol=1e-9)


def test_isam2_marginalize_leaves(rng):
    """Marginalizing old leaves preserves the exact linear solution on the
    live variables (ISAM2.cpp:487-724: factors replaced by the cached
    Gaussian marginal)."""
    from gtsam_petercdev_tpu.linear import solve as linsolve

    n = 16
    gt, odo = _sim_trajectory(n, rng)
    prior_n = noise.isotropic(3, 0.05, jnp.float64)
    odo_n = noise.isotropic(3, 0.1, jnp.float64)
    isam = ISAM2(
        ISAM2Params(enable_relinearization=False, wildfire_threshold=0.0)
    )
    full_graph = NonlinearFactorGraph()
    full_values = Values()
    guesses = []
    for i in range(n):
        nf = NonlinearFactorGraph()
        nv = Values()
        if i == 0:
            guess = gt[0]
            nf.add(prior_factor("Pose2"), [0], gt[0], prior_n)
            full_graph.add(prior_factor("Pose2"), [0], gt[0], prior_n)
        else:
            guess = pose2.compose(gt[i], jnp.asarray(rng.normal(size=3) * 0.1))
            nf.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
            full_graph.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
        guesses.append(guess)
        nv.insert(i, "Pose2", guess)
        full_values.insert(i, "Pose2", guess)
        isam.update(nf, nv)
        if i == 9:
            isam.marginalize_leaves(list(range(6)))

    lg = full_graph.linearize(full_values)
    H, g = linsolve.assemble_dense(lg)
    xb = np.asarray(linsolve.dense_solve(H, g, 0.0)).reshape(-1, 3)
    xi = np.asarray(isam.delta()["Pose2"])
    # live vars (6..n-1) must match the full batch solve exactly
    np.testing.assert_allclose(xi[6:], xb[6:], atol=1e-9)


def test_isam2_no_recompile_steady_state(rng):
    """Odometry-only updates reuse compiled kernels: after warmup, repeated
    same-shape updates add no new jit cache entries."""
    from gtsam_petercdev_tpu.inference import incremental as inc

    gt, odo = _sim_trajectory(40, rng)
    odo_n = noise.isotropic(3, 0.1, jnp.float64)
    isam = ISAM2(ISAM2Params(relinearize_skip=1, relinearize_threshold=0.05))
    nf = NonlinearFactorGraph()
    nv = Values()
    nv.insert(0, "Pose2", gt[0])
    nf.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.05, jnp.float64))
    isam.update(nf, nv)
    counts = None
    for i in range(1, 40):
        nf = NonlinearFactorGraph()
        nv = Values()
        nv.insert(i, "Pose2", pose2.compose(gt[i], jnp.asarray(rng.normal(size=3) * 0.02)))
        nf.add(between_factor("Pose2"), [i - 1, i], odo[i - 1], odo_n)
        isam.update(nf, nv)
        if i == 25:
            counts = (
                inc._level_jit.cache_info().currsize,
                inc._scatter_group_jit.cache_info().currsize,
                inc._wild_jit.cache_info().currsize,
                inc._scatter_pool_jit.cache_info().currsize,
            )
    after = (
        inc._level_jit.cache_info().currsize,
        inc._scatter_group_jit.cache_info().currsize,
        inc._wild_jit.cache_info().currsize,
        inc._scatter_pool_jit.cache_info().currsize,
    )
    # the eliminate kernels (the expensive compiles) must be fully steady;
    # wildfire/scatter kernels may recompile on pool-capacity doublings
    # (log growth by design), never per step
    assert after[0] == counts[0], f"level kernels recompiled: {counts} -> {after}"
    assert after[1] == counts[1], f"scatter recompiled: {counts} -> {after}"
    assert after[2] - counts[2] <= 4 and after[3] - counts[3] <= 4, (
        f"per-step recompiles: {counts} -> {after}"
    )
