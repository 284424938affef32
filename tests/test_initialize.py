"""Chordal (3D) and LAGO (2D) pose-graph initialization.

Golden values generated from the locally-built reference
(Pose3SLAMExample_g2o on pose3example.txt: final error 19130.66).
"""

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.optimizers import LMParams, levenberg_marquardt
from gtsam_petercdev_tpu.slam import initialize
from gtsam_petercdev_tpu.slam.factors import prior_factor
from gtsam_petercdev_tpu.utils import dataset


def test_chordal_init_pose3example_matches_reference():
    g, v = dataset.read_g2o(dataset.find_example_data("pose3example.txt"), is3D=True)
    v_init = initialize.initialize_pose3_chordal(g)
    e_init = float(g.error(v_init))
    e_file = float(g.error(v))
    assert e_init < e_file  # chordal strictly improves the file's guess

    g.add(prior_factor("Pose3"), [0], v_init.at(0), noise.isotropic(6, 0.1, jnp.float64))
    res = levenberg_marquardt(g, v_init, LMParams(max_iterations=50))
    # reference (Pose3SLAMExample_g2o) converges to 19130.66 on this file
    assert res.error <= 19130.66 * 1.001, res.error


def test_lago_init_noisy_toy():
    g, v = dataset.read_g2o(dataset.find_example_data("noisyToyGraph.txt"))
    v_init = initialize.initialize_pose2_lago(g)
    # LAGO init should land close to the optimum (GN error ~0.0685)
    e = float(g.error(v_init))
    assert e < 0.5, e

    g.add(
        prior_factor("Pose2"), [0], v_init.at(0),
        noise.diagonal_precisions(jnp.array([1e6, 1e6, 1e8])),
    )
    res = levenberg_marquardt(g, v_init, LMParams(max_iterations=30))
    assert res.error < 0.07, res.error


def test_lago_handles_orientation_wrap():
    """A loop whose accumulated orientation winds past pi."""
    import jax.numpy as jnp

    from gtsam_petercdev_tpu.geometry import pose2
    from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
    from gtsam_petercdev_tpu.nonlinear.values import Values
    from gtsam_petercdev_tpu.slam.factors import between_factor

    n = 8
    dtheta = 2 * np.pi / n
    graph = NonlinearFactorGraph()
    gt = []
    p = jnp.asarray([0.0, 0.0, 0.0], dtype=jnp.float64)
    for i in range(n):
        gt.append(p)
        p = pose2.compose(p, jnp.asarray([1.0, 0.0, dtheta], dtype=jnp.float64))
    model = noise.isotropic(3, 0.05, jnp.float64)
    for i in range(n - 1):
        graph.add(
            between_factor("Pose2"), [i, i + 1],
            pose2.between(gt[i], gt[i + 1]), model,
        )
    graph.add(
        between_factor("Pose2"), [n - 1, 0], pose2.between(gt[-1], gt[0]), model
    )
    v_init = initialize.initialize_pose2_lago(graph)
    for i in range(n):
        d = np.asarray(pose2.local(v_init.at(i), gt[i]))
        assert np.linalg.norm(d) < 1e-6, (i, d)
