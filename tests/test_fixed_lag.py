"""Fixed-lag smoother: window bounding + marginalization correctness.

Strategy (mirrors gtsam_unstable fixed-lag tests): the smoother's estimate
of in-window states must match the full batch solution over the whole
history, because marginalization preserves the boundary information.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.fixed_lag import BatchFixedLagSmoother, marginalize_keys
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _unary_xy():
    def residual(xs, params):
        (x,) = xs
        return x[:2] - params

    return FactorType("UnaryXY", ("Pose2",), 2, residual)


def _simulate(T, rng):
    odo = jnp.asarray([1.0, 0.0, 0.05], dtype=jnp.float64)
    gt = [jnp.zeros(3, dtype=jnp.float64)]
    for _ in range(T - 1):
        gt.append(pose2.compose(gt[-1], odo))
    meas = [np.asarray(p[:2]) + rng.normal(size=2) * 0.05 for p in gt]
    return gt, odo, meas


def test_marginalize_keys_preserves_information():
    """Linear-ish check: marginalizing key 0 must leave the solution over
    the remaining keys unchanged."""
    rng = np.random.default_rng(0)
    gt, odo, meas = _simulate(4, rng)
    graph = NonlinearFactorGraph()
    values = Values()
    un = _unary_xy()
    for i, p in enumerate(gt):
        values.insert(i, "Pose2", pose2.retract(p, jnp.asarray(rng.normal(size=3) * 0.01)))
        graph.add(un, [i], jnp.asarray(meas[i]), noise.isotropic(2, 0.05, jnp.float64))
    for i in range(3):
        graph.add(between_factor("Pose2"), [i, i + 1], odo, noise.isotropic(3, 0.02, jnp.float64))
    graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, jnp.float64))

    full = optimizers.levenberg_marquardt(graph, values, optimizers.LMParams(max_iterations=20))

    g2, v2 = marginalize_keys(graph, full.values, [0])
    assert 0 not in v2
    res2 = optimizers.levenberg_marquardt(g2, v2, optimizers.LMParams(max_iterations=20))
    for k in [1, 2, 3]:
        d = np.asarray(pose2.local(res2.values.at(k), full.values.at(k)))
        assert np.linalg.norm(d) < 1e-6, (k, d)


def test_fixed_lag_matches_batch():
    rng = np.random.default_rng(3)
    T = 12
    lag = 4.0
    gt, odo, meas = _simulate(T, rng)
    un = _unary_xy()
    m_un = noise.isotropic(2, 0.05, jnp.float64)
    m_odo = noise.isotropic(3, 0.02, jnp.float64)

    smoother = BatchFixedLagSmoother(lag, optimizers.LMParams(max_iterations=15))
    batch_graph = NonlinearFactorGraph()
    batch_values = Values()

    for t in range(T):
        nf = NonlinearFactorGraph()
        nv = Values()
        init = gt[t] if t == 0 else pose2.compose(smoother.values.at(t - 1), odo)
        nv.insert(t, "Pose2", init)
        batch_values.insert(t, "Pose2", init)
        nf.add(un, [t], jnp.asarray(meas[t]), m_un)
        batch_graph.add(un, [t], jnp.asarray(meas[t]), m_un)
        if t == 0:
            nf.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, jnp.float64))
            batch_graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, jnp.float64))
        else:
            nf.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
            batch_graph.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
        smoother.update(nf, nv, {t: float(t)})

    # window is bounded
    assert len(smoother.values) <= int(lag) + 2

    batch = optimizers.levenberg_marquardt(
        batch_graph, batch_values, optimizers.LMParams(max_iterations=30)
    )
    # in-window estimates match the full batch solution
    for k in smoother.values.keys():
        d = np.asarray(pose2.local(smoother.values.at(k), batch.values.at(k)))
        assert np.linalg.norm(d) < 1e-3, (k, d)


def test_incremental_fixed_lag_matches_batch():
    """IncrementalFixedLagSmoother (ISAM2 + marginalizeLeaves): in-window
    estimates match the full batch solution; tree size stays bounded over a
    horizon 10x the lag (IncrementalFixedLagSmoother.h:42 semantics)."""
    from gtsam_petercdev_tpu.nonlinear.fixed_lag import IncrementalFixedLagSmoother
    from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2Params

    rng = np.random.default_rng(7)
    T = 40
    lag = 4.0
    gt, odo, meas = _simulate(T, rng)
    un = _unary_xy()
    m_un = noise.isotropic(2, 0.05, jnp.float64)
    m_odo = noise.isotropic(3, 0.02, jnp.float64)

    smoother = IncrementalFixedLagSmoother(
        lag,
        ISAM2Params(
            relinearize_threshold=0.0,
            relinearize_skip=1,
            wildfire_threshold=0.0,
        ),
    )
    batch_graph = NonlinearFactorGraph()
    batch_values = Values()

    max_live = 0
    est = None
    for t in range(T):
        nf = NonlinearFactorGraph()
        nv = Values()
        init = gt[t] if t == 0 else pose2.compose(est.at(t - 1), odo)
        nv.insert(t, "Pose2", init)
        batch_values.insert(t, "Pose2", init)
        nf.add(un, [t], jnp.asarray(meas[t]), m_un)
        batch_graph.add(un, [t], jnp.asarray(meas[t]), m_un)
        if t == 0:
            pr = noise.isotropic(3, 0.01, jnp.float64)
            nf.add(prior_factor("Pose2"), [0], gt[0], pr)
            batch_graph.add(prior_factor("Pose2"), [0], gt[0], pr)
        else:
            nf.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
            batch_graph.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
        r = smoother.update(nf, nv, {t: float(t)})
        est = r.values
        max_live = max(max_live, smoother.isam.engine.n_live)

    # window (and tree) bounded: horizon is 10x lag yet live cliques never
    # exceeded the window size
    assert len(est) <= int(lag) + 2
    assert max_live <= int(lag) + 3, max_live

    batch = optimizers.levenberg_marquardt(
        batch_graph, batch_values, optimizers.LMParams(max_iterations=30)
    )
    for k in est.keys():
        d = np.asarray(pose2.local(est.at(k), batch.values.at(k)))
        assert np.linalg.norm(d) < 2e-3, (k, d)
