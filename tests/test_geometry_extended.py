"""Sim3 / Unit3 / EssentialMatrix / planes / lines + sam factors.

Lie/manifold axioms checked numerically (the reference's testLie.h pattern,
oracle = jax autodiff / closed identities).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import essential, pose2, sim3, so3, unit3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.sam import (
    bearing_factor_2d,
    bearing_range_factor_2d,
    range_factor,
)
from gtsam_petercdev_tpu.slam.factors import prior_factor


def test_sim3_group_axioms(rng):
    xi1 = jnp.asarray(rng.normal(size=7) * 0.3)
    xi2 = jnp.asarray(rng.normal(size=7) * 0.3)
    g1, g2 = sim3.expmap(xi1), sim3.expmap(xi2)
    # log(exp(xi)) == xi
    np.testing.assert_allclose(np.asarray(sim3.logmap(g1)), np.asarray(xi1), atol=1e-9)
    # inverse
    e = sim3.compose(g1, sim3.inverse(g1))
    np.testing.assert_allclose(np.asarray(e.R), np.eye(3), atol=1e-9)
    np.testing.assert_allclose(np.asarray(e.t), 0, atol=1e-9)
    np.testing.assert_allclose(float(e.s), 1.0, atol=1e-9)
    # associativity of action: (g1*g2)(p) == g1(g2(p))
    p = jnp.asarray(rng.normal(size=3))
    lhs = sim3.transform_from(sim3.compose(g1, g2), p)
    rhs = sim3.transform_from(g1, sim3.transform_from(g2, p))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-9)
    # scale composes multiplicatively
    np.testing.assert_allclose(
        float(sim3.compose(g1, g2).s), float(g1.s) * float(g2.s), atol=1e-12
    )


def test_sim3_retract_local_roundtrip(rng):
    m = manifold.get("Sim3")
    g = sim3.expmap(jnp.asarray(rng.normal(size=7) * 0.4))
    xi = jnp.asarray(rng.normal(size=7) * 0.2)
    g2 = m.retract(g, xi)
    np.testing.assert_allclose(np.asarray(m.local(g, g2)), np.asarray(xi), atol=1e-9)


def test_unit3_retract_local_roundtrip(rng):
    for _ in range(5):
        p = unit3.normalize(jnp.asarray(rng.normal(size=3)))
        xi = jnp.asarray(rng.normal(size=2) * 0.4)
        q = unit3.retract(p, xi)
        np.testing.assert_allclose(float(jnp.linalg.norm(q)), 1.0, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(unit3.local(p, q)), np.asarray(xi), atol=1e-9
        )


def test_essential_epipolar_constraint(rng):
    # two cameras observing the same point satisfy the epipolar constraint
    R = so3.expmap(jnp.asarray(rng.normal(size=3) * 0.2))
    t = unit3.normalize(jnp.asarray(rng.normal(size=3)))
    E = essential.EssentialMatrix(R, t)
    # point seen from cam A at depth; cam B pose (R, t): x_a = R x_b + t
    for _ in range(5):
        xb = jnp.asarray(np.r_[rng.normal(size=2), rng.uniform(2, 5)])
        xa = so3.rotate(R, xb) + t * rng.uniform(0.5, 2.0)
        pa = xa[:2] / xa[2]
        pb = xb[:2] / xb[2]
        err = essential.epipolar_error(E, pa, pb)
        # direction scale of t is projective: error vanishes only for the
        # scale used; use the exact translation
    xa = so3.rotate(R, xb) + t
    pa = xa[:2] / xa[2]
    err = float(essential.epipolar_error(E, pa, pb))
    assert abs(err) < 1e-9


def test_plane_transform_invariant_distance(rng):
    from gtsam_petercdev_tpu.geometry import pose3

    pl = essential.plane_from_coeffs(
        jnp.asarray(0.1), jnp.asarray(0.5), jnp.asarray(1.0), jnp.asarray(-2.0)
    )
    point = jnp.asarray(rng.normal(size=3))
    pose = pose3.expmap(jnp.asarray(rng.normal(size=6) * 0.4))
    # distance to a point is invariant under joint transform
    d1 = float(essential.plane_distance(pl, point))
    pl_t = essential.plane_transform(pl, pose.R, pose.t)
    point_t = pose3.transform_to(pose, point)
    d2 = float(essential.plane_distance(pl_t, point_t))
    np.testing.assert_allclose(d1, d2, atol=1e-9)


def test_line3_retract_local(rng):
    from gtsam_petercdev_tpu.geometry.essential import Line3, line_local, line_retract

    l = Line3(so3.expmap(jnp.asarray(rng.normal(size=3))), jnp.asarray(0.3), jnp.asarray(-0.2))
    xi = jnp.asarray(rng.normal(size=4) * 0.3)
    l2 = line_retract(l, xi)
    np.testing.assert_allclose(np.asarray(line_local(l, l2)), np.asarray(xi), atol=1e-9)


def test_bearing_range_localization():
    """Robot at unknown Pose2 localizes a landmark from bearing+range
    (PlanarSLAMExample pattern)."""
    gt_pose = jnp.asarray([0.5, 0.2, 0.3], dtype=jnp.float64)
    gt_lm = jnp.asarray([2.0, 1.0], dtype=jnp.float64)

    # true measurements
    c, s = np.cos(0.3), np.sin(0.3)
    d = np.asarray(gt_lm) - np.asarray(gt_pose[:2])
    local = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
    bearing = np.arctan2(local[1], local[0])
    rng_m = np.linalg.norm(d)

    graph = NonlinearFactorGraph()
    values = Values()
    values.insert(0, "Pose2", jnp.zeros(3, dtype=jnp.float64))
    values.insert(1, "Point2", jnp.asarray([1.0, 0.0], dtype=jnp.float64))
    graph.add(prior_factor("Pose2"), [0], gt_pose, noise.isotropic(3, 1e-3, jnp.float64))
    graph.add(
        bearing_range_factor_2d(), [0, 1],
        jnp.asarray([bearing, rng_m], dtype=jnp.float64),
        noise.diagonal_sigmas(jnp.asarray([0.01, 0.05])),
    )
    res = optimizers.levenberg_marquardt(graph, values, optimizers.LMParams(max_iterations=50))
    np.testing.assert_allclose(np.asarray(res.values.at(1)), np.asarray(gt_lm), atol=1e-3)


def test_range_only_trilateration():
    gt_lm = np.array([1.0, 2.0])
    poses = [np.array([0.0, 0.0, 0.0]), np.array([3.0, 0.0, 0.0]), np.array([0.0, 4.0, 0.0])]
    graph = NonlinearFactorGraph()
    values = Values()
    for i, p in enumerate(poses):
        values.insert(i, "Pose2", jnp.asarray(p, dtype=jnp.float64))
        graph.add(prior_factor("Pose2"), [i], jnp.asarray(p, dtype=jnp.float64), noise.isotropic(3, 1e-4, jnp.float64))
    values.insert(10, "Point2", jnp.asarray([0.5, 0.5], dtype=jnp.float64))
    for i, p in enumerate(poses):
        r = np.linalg.norm(gt_lm - p[:2])
        graph.add(range_factor("Pose2", "Point2"), [i, 10], jnp.asarray(r, dtype=jnp.float64), noise.isotropic(1, 0.01, jnp.float64))
    res = optimizers.levenberg_marquardt(graph, values, optimizers.LMParams(max_iterations=60))
    np.testing.assert_allclose(np.asarray(res.values.at(10)), gt_lm, atol=1e-3)
