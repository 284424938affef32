"""Linear KF, RTS smoother, and manifold EKF.

Mirrors gtsam/linear/tests/testKalmanFilter.cpp (the classic 1D/2D cases)
and nonlinear/tests/testExtendedKalmanFilter.cpp.
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear import kalman
from gtsam_petercdev_tpu.nonlinear import ekf
from gtsam_petercdev_tpu.geometry import pose2


def test_kf_constant_position():
    """testKalmanFilter.cpp example: unit motion, repeated measurement."""
    F = jnp.eye(2)
    B = jnp.eye(2)
    u = jnp.asarray([1.0, 0.0])
    Q = 0.01 * jnp.eye(2)
    H = jnp.eye(2)
    R = 0.01 * jnp.eye(2)

    s = kalman.init(jnp.zeros(2), 0.01 * jnp.eye(2))
    expected = [[1.0, 0.0], [2.0, 0.0], [3.0, 0.0]]
    for t in range(3):
        s = kalman.predict(s, F, B, u, Q)
        s = kalman.update(s, H, jnp.asarray(expected[t]), R)
        np.testing.assert_allclose(np.asarray(s.mean), expected[t], atol=1e-9)
    # steady-state variance below prior
    assert float(s.cov[0, 0]) < 0.01


def test_kf_variance_growth_and_reduction():
    s = kalman.init(jnp.zeros(1), jnp.asarray([[1.0]]))
    s2 = kalman.predict(s, jnp.eye(1), Q=jnp.asarray([[0.5]]))
    assert float(s2.cov[0, 0]) == 1.5
    s3 = kalman.update(s2, jnp.eye(1), jnp.asarray([0.0]), jnp.asarray([[1.5]]))
    np.testing.assert_allclose(float(s3.cov[0, 0]), 0.75, atol=1e-12)


def test_rts_smoother_reduces_variance():
    rng = np.random.default_rng(0)
    T = 20
    F = jnp.eye(1)
    Q = jnp.asarray([[0.1]])
    R = jnp.asarray([[0.5]])
    x_true = np.cumsum(rng.normal(size=T) * 0.3)
    z = x_true + rng.normal(size=T) * 0.7

    s = kalman.init(jnp.zeros(1), jnp.asarray([[1.0]]))
    mf, Pf, mp, Pp = [], [], [], []
    for t in range(T):
        sp = kalman.predict(s, F, Q=Q)
        mp.append(sp.mean)
        Pp.append(sp.cov)
        s = kalman.update(sp, jnp.eye(1), jnp.asarray([z[t]]), R)
        mf.append(s.mean)
        Pf.append(s.cov)
    filt = kalman.GaussianState(jnp.stack(mf), jnp.stack(Pf))
    pred = kalman.GaussianState(jnp.stack(mp), jnp.stack(Pp))
    sm = kalman.smooth_rts(filt, pred, jnp.broadcast_to(F, (T, 1, 1)))
    # smoothed variance <= filtered everywhere (equality at final step)
    assert np.all(np.asarray(sm.cov)[:, 0, 0] <= np.asarray(filt.cov)[:, 0, 0] + 1e-12)
    # RMSE improves only in expectation — allow single-realization slack
    rmse_f = np.sqrt(np.mean((np.asarray(filt.mean)[:, 0] - x_true) ** 2))
    rmse_s = np.sqrt(np.mean((np.asarray(sm.mean)[:, 0] - x_true) ** 2))
    assert rmse_s <= rmse_f * 1.25
    # final step untouched by smoothing
    np.testing.assert_allclose(
        np.asarray(sm.mean)[-1], np.asarray(filt.mean)[-1], atol=1e-12
    )


def test_ekf_pose2_localization():
    """EKF on Pose2 with odometry + position measurements."""
    rng = np.random.default_rng(1)
    x_true = jnp.asarray([0.0, 0.0, 0.0], dtype=jnp.float64)
    belief = ekf.ManifoldBelief(x_true, 0.01 * jnp.eye(3, dtype=jnp.float64))
    odo = jnp.asarray([1.0, 0.0, 0.1], dtype=jnp.float64)
    Q = 0.001 * jnp.eye(3, dtype=jnp.float64)
    R = 0.01 * jnp.eye(2, dtype=jnp.float64)

    x = x_true
    for t in range(10):
        x = pose2.compose(x, odo)
        belief = ekf.predict(belief, "Pose2", lambda p: pose2.compose(p, odo), Q)
        z = x[:2] + jnp.asarray(rng.normal(size=2) * 0.01)
        belief = ekf.update(belief, "Pose2", lambda p: p[:2], z, R)

    err = np.asarray(pose2.local(belief.value, x))
    assert np.linalg.norm(err) < 0.15, err
    assert float(jnp.trace(belief.cov)) < 0.1
