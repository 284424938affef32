"""Concurrent filtering and smoothing (two-solver architecture).

Mirrors gtsam_unstable's ConcurrentBatchFilter/Smoother tests: after
synchronize() exchanges, the filter's in-window estimates and the
smoother's history estimates must both match the full batch solution —
information flows through the separator without double counting.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.concurrent import (
    ConcurrentBatchFilter,
    ConcurrentBatchSmoother,
    synchronize,
)
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def _unary_xy():
    def residual(xs, params):
        (x,) = xs
        return x[:2] - params

    return FactorType("UnaryXY", ("Pose2",), 2, residual)


def test_concurrent_matches_batch():
    rng = np.random.default_rng(2)
    T = 16
    lag = 4.0
    odo = jnp.asarray([1.0, 0.0, 0.05], dtype=jnp.float64)
    gt = [jnp.zeros(3, dtype=jnp.float64)]
    for _ in range(T - 1):
        gt.append(pose2.compose(gt[-1], odo))
    meas = [np.asarray(p[:2]) + rng.normal(size=2) * 0.05 for p in gt]

    un = _unary_xy()
    m_un = noise.isotropic(2, 0.05, jnp.float64)
    m_odo = noise.isotropic(3, 0.02, jnp.float64)
    m_pr = noise.isotropic(3, 0.01, jnp.float64)

    filt = ConcurrentBatchFilter(lag)
    smoother = ConcurrentBatchSmoother()
    batch_graph = NonlinearFactorGraph()
    batch_values = Values()

    est = None
    for t in range(T):
        nf, nv = NonlinearFactorGraph(), Values()
        init = gt[t] if t == 0 else pose2.compose(est.at(t - 1), odo)
        nv.insert(t, "Pose2", init)
        batch_values.insert(t, "Pose2", init)
        nf.add(un, [t], jnp.asarray(meas[t]), m_un)
        batch_graph.add(un, [t], jnp.asarray(meas[t]), m_un)
        if t == 0:
            nf.add(prior_factor("Pose2"), [0], gt[0], m_pr)
            batch_graph.add(prior_factor("Pose2"), [0], gt[0], m_pr)
        else:
            nf.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
            batch_graph.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
        res = filt.update(nf, nv, {t: float(t)})
        est = res.values
        if t % 4 == 3:  # periodic synchronization
            synchronize(filt, smoother)

    batch = optimizers.levenberg_marquardt(
        batch_graph, batch_values, optimizers.LMParams(max_iterations=40)
    )

    # filter: in-window estimates match batch
    for k in filt.values.keys():
        d = np.asarray(pose2.local(filt.values.at(k), batch.values.at(k)))
        assert np.linalg.norm(d) < 5e-3, ("filter", k, d)
    # smoother: history estimates match batch
    n_hist = 0
    for k in smoother.values.keys():
        if k in smoother.separator:
            continue
        d = np.asarray(pose2.local(smoother.values.at(k), batch.values.at(k)))
        assert np.linalg.norm(d) < 5e-3, ("smoother", k, d)
        n_hist += 1
    assert n_hist >= 8  # most of the history lives in the smoother
    # window stays bounded
    assert len(filt.values) <= int(lag) + 3


def test_concurrent_smoother_refines_filter_prior():
    """The smoother's summarization must actually inform the filter: with
    a strong unary measurement landing in the smoother's history, the
    filter separator estimate reflects it after synchronize."""
    un = _unary_xy()
    m_un = noise.isotropic(2, 0.001, jnp.float64)  # very strong
    m_odo = noise.isotropic(3, 0.5, jnp.float64)  # weak odometry

    filt = ConcurrentBatchFilter(lag=2.0)
    smoother = ConcurrentBatchSmoother()
    est = None
    for t in range(8):
        nf, nv = NonlinearFactorGraph(), Values()
        init = jnp.asarray([float(t), 0.0, 0.0])
        nv.insert(t, "Pose2", init)
        if t == 0:
            nf.add(prior_factor("Pose2"), [0], jnp.zeros(3),
                   noise.isotropic(3, 0.01, jnp.float64))
            nf.add(un, [0], jnp.asarray([0.5, 0.0]), m_un)  # pin x0 at 0.5!
        else:
            nf.add(between_factor("Pose2"), [t - 1, t],
                   jnp.asarray([1.0, 0.0, 0.0]), m_odo)
        filt.update(nf, nv, {t: float(t)})
        if t % 2 == 1:
            synchronize(filt, smoother)
    # the strong unary on pose 0 lives in the smoother now; its influence
    # must survive into the filter chain: x of the oldest in-window pose
    # should be near 0.5 + (t - 0) * 1.0 drift-corrected
    oldest = min(filt.values.keys())
    x = float(np.asarray(filt.values.at(oldest))[0])
    assert abs(x - (0.5 + oldest)) < 0.2, (oldest, x)


def test_concurrent_incremental_matches_batch_pair():
    """ConcurrentIncrementalFilter/Smoother (iSAM2 halves) reproduce the
    batch pair's estimates on the same stream (the reference's own
    correctness strategy for its incremental concurrent classes)."""
    from gtsam_petercdev_tpu.nonlinear.concurrent import (
        ConcurrentIncrementalFilter,
        ConcurrentIncrementalSmoother,
        synchronize_incremental,
    )
    from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2Params

    rng = np.random.default_rng(2)
    T = 16
    lag = 4.0
    odo = jnp.asarray([1.0, 0.0, 0.05], dtype=jnp.float64)
    gt = [jnp.zeros(3, dtype=jnp.float64)]
    for _ in range(T - 1):
        gt.append(pose2.compose(gt[-1], odo))
    meas = [np.asarray(p[:2]) + rng.normal(size=2) * 0.05 for p in gt]

    un = _unary_xy()
    m_un = noise.isotropic(2, 0.05, jnp.float64)
    m_odo = noise.isotropic(3, 0.02, jnp.float64)
    m_pr = noise.isotropic(3, 0.01, jnp.float64)

    def run_pair(incremental: bool):
        if incremental:
            ip = ISAM2Params(relinearize_threshold=1e-4, relinearize_skip=1)
            filt = ConcurrentIncrementalFilter(lag, ip)
            smoother = ConcurrentIncrementalSmoother(
                ISAM2Params(relinearize_threshold=1e-4, relinearize_skip=1)
            )
        else:
            filt = ConcurrentBatchFilter(lag)
            smoother = ConcurrentBatchSmoother()
        est = None
        for t in range(T):
            nf, nv = NonlinearFactorGraph(), Values()
            init = gt[t] if t == 0 else pose2.compose(est.at(t - 1), odo)
            nv.insert(t, "Pose2", init)
            nf.add(un, [t], jnp.asarray(meas[t]), m_un)
            if t == 0:
                nf.add(prior_factor("Pose2"), [0], gt[0], m_pr)
            else:
                nf.add(between_factor("Pose2"), [t - 1, t], odo, m_odo)
            filt.update(nf, nv, {t: float(t)})
            est = filt.values
            if t % 4 == 3:
                if incremental:
                    synchronize_incremental(filt, smoother)
                else:
                    synchronize(filt, smoother)
        return filt, smoother

    fb, sb = run_pair(False)
    fi, si = run_pair(True)

    sep = set(si.separator)
    for k in fi.values.keys():
        # separator keys: the batch filter ADOPTS the smoother's estimate at
        # synchronize (a copy, not an optimization); the incremental filter
        # keeps its own optimum of (window + summarized prior). Compare the
        # smoother-side estimates for those instead (below).
        if k in fb.values and k not in sep:
            d = np.asarray(pose2.local(fi.values.at(k), fb.values.at(k)))
            assert np.linalg.norm(d) < 5e-3, ("filter", k, d)
    for k in sep:
        if k in sb.values and k in si.values:
            d = np.asarray(pose2.local(si.values.at(k), sb.values.at(k)))
            assert np.linalg.norm(d) < 5e-3, ("separator", k, d)
    n_hist = 0
    for k in si.values.keys():
        if k in si.separator or k not in sb.values:
            continue
        d = np.asarray(pose2.local(si.values.at(k), sb.values.at(k)))
        assert np.linalg.norm(d) < 5e-3, ("smoother", k, d)
        n_hist += 1
    assert n_hist >= 8
    assert len(fi.values) <= int(lag) + 3
