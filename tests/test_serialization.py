"""Checkpoint round-trips (analog of tests/testSerializationSlam.cpp)."""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
from gtsam_petercdev_tpu.utils import serialization


def _problem():
    rng = np.random.default_rng(2)
    gt = [jnp.asarray([float(i), 0.0, 0.1 * i], dtype=jnp.float64) for i in range(4)]
    graph = NonlinearFactorGraph()
    values = Values()
    for i, p in enumerate(gt):
        values.insert(i, "Pose2", pose2.retract(p, jnp.asarray(rng.normal(size=3) * 0.1)))
    graph.add(prior_factor("Pose2"), [0], gt[0], noise.isotropic(3, 0.01, jnp.float64))
    for i in range(3):
        graph.add(
            between_factor("Pose2"), [i, i + 1],
            pose2.between(gt[i], gt[i + 1]),
            noise.isotropic(3, 0.1, jnp.float64),
            robust=noise.huber(1.345) if i == 1 else None,
        )
    return graph, values


def test_values_roundtrip(tmp_path):
    _, values = _problem()
    p = str(tmp_path / "values.bin")
    serialization.save_values(p, values)
    v2 = serialization.load_values(p)
    assert set(v2.keys()) == set(values.keys())
    for k in values.keys():
        np.testing.assert_allclose(np.asarray(v2.at(k)), np.asarray(values.at(k)))


def test_graph_roundtrip_preserves_error(tmp_path):
    graph, values = _problem()
    e0 = float(graph.error(values))
    p = str(tmp_path / "graph.bin")
    serialization.save_graph(p, graph)
    g2 = serialization.load_graph(p)
    e1 = float(g2.error(values))
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
    # robust spec survives
    robusts = [b.robust for b in g2.batches if b.robust is not None]
    assert robusts and robusts[0].name == "huber"


def test_checkpoint_resume_optimization(tmp_path):
    graph, values = _problem()
    half = optimizers.gauss_newton(graph, values, optimizers.OptimizerParams(max_iterations=1))
    p = str(tmp_path / "ckpt.bin")
    serialization.save_checkpoint(p, graph, half.values, {"iter": jnp.asarray(1)})
    g2, v2, extra = serialization.load_checkpoint(p)
    assert int(extra["iter"]) == 1
    full = optimizers.gauss_newton(graph, values)
    resumed = optimizers.gauss_newton(g2, v2)
    np.testing.assert_allclose(resumed.error, full.error, rtol=1e-8, atol=1e-10)


def test_isam2_checkpoint_roundtrip(tmp_path):
    """Resume an incremental City run mid-stream: same final state as the
    uninterrupted run (reference: SolverComparer.cpp:19-30 serializes whole
    ISAM2 instances between runs)."""
    import jax.numpy as jnp

    from gtsam_petercdev_tpu.linear import noise
    from gtsam_petercdev_tpu.models.city10000 import parse_city10000
    from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
    from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_petercdev_tpu.nonlinear.values import Values
    from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
    from gtsam_petercdev_tpu.utils import serialization as ser

    prior_sig = np.asarray(noise.diagonal_sigmas(np.asarray([1e-4] * 3)))
    pose_sig = np.asarray(
        noise.diagonal_sigmas(np.asarray([1 / 30.0, 1 / 30.0, 1 / 100.0]))
    )
    lines = parse_city10000(
        "/root/reference/examples/Data/T1_city10000_04.txt", 240
    )

    def drive(isam, seg, n_poses):
        for (keyS, keyT, meas) in seg:
            odom = np.asarray(meas[0])
            nf, nv = NonlinearFactorGraph(), Values()
            if keyS == keyT - 1:
                prev = isam.calculate_estimate_key(keyS)
                import gtsam_petercdev_tpu.geometry.pose2 as pose2

                nv.insert(keyT, "Pose2", pose2.compose(prev, jnp.asarray(odom)))
                n_poses += 1
            nf.add(between_factor("Pose2"), [keyS, keyT], jnp.asarray(odom),
                   pose_sig)
            isam.update(nf, nv)
        return n_poses

    def fresh():
        isam = ISAM2(ISAM2Params(relinearize_threshold=0.01,
                                 relinearize_skip=1, wildfire_threshold=0.0))
        nf, nv = NonlinearFactorGraph(), Values()
        nv.insert(0, "Pose2", jnp.zeros(3))
        nf.add(prior_factor("Pose2"), [0], jnp.zeros(3), prior_sig)
        isam.update(nf, nv)
        return isam

    # uninterrupted
    a = fresh()
    np_a = drive(a, lines, 1)
    est_a = a.calculate_estimate()

    # checkpoint at 120 lines, reload, finish
    b = fresh()
    np_b = drive(b, lines[:120], 1)
    path = str(tmp_path / "isam2.ckpt")
    ser.save_isam2(path, b)
    b2 = ser.load_isam2(path)
    np_b = drive(b2, lines[120:], np_b)
    est_b = b2.calculate_estimate()

    assert np_a == np_b
    for k in range(np_a):
        np.testing.assert_allclose(
            np.asarray(est_a.at(k)), np.asarray(est_b.at(k)), atol=1e-9
        )
