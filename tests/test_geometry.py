"""Lie group axiom + Jacobian tests (mirrors reference testLie.h / chartTesting.h).

The universal oracle is jax.jacfwd / finite differences replacing the
reference's numericalDerivative (gtsam/base/numericalDerivative.h:108-180).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import pose2, pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3

GROUPS = ["Rot2", "Rot3", "Pose2", "Pose3", "Point3"]


def random_element(t, rng):
    m = manifold.get(t)
    xi = jnp.asarray(rng.normal(size=(m.dim,)) * 0.8)
    return m.retract(
        jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype=jnp.float64),
                               m.identity(dtype=jnp.float64)),
        xi,
    )


def tree_allclose(a, b, atol=1e-9):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.allclose(x, y, atol=atol) for x, y in zip(fa, fb))


@pytest.mark.parametrize("t", GROUPS)
def test_group_axioms(t, rng):
    m = manifold.get(t)
    a, b, c = (random_element(t, rng) for _ in range(3))
    e = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype=jnp.float64), m.identity(dtype=jnp.float64)
    )
    # identity
    assert tree_allclose(m.compose(a, e), a)
    assert tree_allclose(m.compose(e, a), a)
    # inverse
    assert tree_allclose(m.compose(a, m.inverse(a)), e, atol=1e-8)
    # associativity
    assert tree_allclose(
        m.compose(m.compose(a, b), c), m.compose(a, m.compose(b, c)), atol=1e-8
    )
    # between
    assert tree_allclose(m.compose(a, m.between(a, b)), b, atol=1e-8)


@pytest.mark.parametrize("t", GROUPS)
def test_exp_log_roundtrip(t, rng):
    m = manifold.get(t)
    for scale in (1e-8, 1e-3, 0.5, 2.0):
        xi = jnp.asarray(rng.normal(size=(m.dim,))) * scale
        g = m.expmap(xi)
        xi2 = m.logmap(g)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-8)


@pytest.mark.parametrize("t", GROUPS)
def test_retract_local_roundtrip(t, rng):
    m = manifold.get(t)
    a = random_element(t, rng)
    xi = jnp.asarray(rng.normal(size=(m.dim,)) * 0.3)
    b = m.retract(a, xi)
    np.testing.assert_allclose(np.asarray(m.local(a, b)), np.asarray(xi), atol=1e-8)


def test_so3_logmap_near_pi(rng):
    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)
    for theta in (np.pi - 1e-3, np.pi - 1e-7, np.pi):
        w = jnp.asarray(axis * theta)
        R = so3.expmap(w)
        w2 = so3.logmap(R)
        R2 = so3.expmap(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)


def test_so3_expmap_derivative_vs_autodiff(rng):
    """Jr: Exp(w + dw) ≈ Exp(w) Exp(Jr dw) (SO3.h:68-86)."""
    w = jnp.asarray(rng.normal(size=3))
    Jr = so3.expmap_derivative(w)

    def f(dw):
        return so3.logmap(so3.between(so3.expmap(w), so3.expmap(w + dw)))

    J_auto = jax.jacfwd(f)(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(J_auto), atol=1e-7)
    # inverse relation
    np.testing.assert_allclose(
        np.asarray(so3.logmap_derivative(w) @ Jr), np.eye(3), atol=1e-7
    )


def test_so3_small_angle_gradients_finite():
    """Autodiff through expmap/logmap must be NaN-free at the singular points."""
    g = jax.jacfwd(so3.expmap)(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.jacfwd(lambda w: so3.logmap(so3.expmap(w)))(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(g2), np.eye(3), atol=1e-9)


def test_pose3_expmap_matches_adjoint_identity(rng):
    """Exp(Ad_T xi) = T Exp(xi) T^{-1} (Pose3.h AdjointMap)."""
    xi = jnp.asarray(rng.normal(size=6) * 0.3)
    T = random_element("Pose3", rng)
    lhs = pose3.expmap(pose3.adjoint_map(T) @ xi)
    rhs = pose3.compose(pose3.compose(T, pose3.expmap(xi)), pose3.inverse(T))
    assert tree_allclose(lhs, rhs, atol=1e-8)


def test_pose2_expmap_matches_reference_formula(rng):
    """Cross-check SE(2) exp against the rotation-center construction
    (Pose2.cpp:66-79)."""
    for _ in range(5):
        xi = rng.normal(size=3)
        vx, vy, w = xi
        if abs(w) < 1e-10:
            expected = np.array([vx, vy, w])
        else:
            c, s = np.cos(w), np.sin(w)
            # v_ortho = R_{pi/2} v ; t = (v_ortho - R(w) v_ortho)/w
            vo = np.array([-vy, vx])
            Rw = np.array([[c, -s], [s, c]])
            t = (vo - Rw @ vo) / w
            expected = np.array([t[0], t[1], w])
        got = np.asarray(pose2.expmap(jnp.asarray(xi)))
        np.testing.assert_allclose(got, expected, atol=1e-9)


def test_pose3_transform(rng):
    T = random_element("Pose3", rng)
    p = jnp.asarray(rng.normal(size=3))
    q = pose3.transform_from(T, p)
    np.testing.assert_allclose(
        np.asarray(pose3.transform_to(T, q)), np.asarray(p), atol=1e-9
    )


def test_quaternion_roundtrip(rng):
    for _ in range(10):
        w = jnp.asarray(rng.normal(size=3) * 2.0)
        R = so3.expmap(w)
        q = so3.to_quaternion(R)
        R2 = so3.from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-8)


def test_batched_ops(rng):
    """All geometry ops broadcast over leading batch dims."""
    w = jnp.asarray(rng.normal(size=(7, 3)))
    R = so3.expmap(w)
    assert R.shape == (7, 3, 3)
    np.testing.assert_allclose(np.asarray(so3.logmap(R)), np.asarray(w), atol=1e-8)

    xi = jnp.asarray(rng.normal(size=(5, 6)) * 0.5)
    P = pose3.expmap(xi)
    assert P.R.shape == (5, 3, 3) and P.t.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(pose3.logmap(P)), np.asarray(xi), atol=1e-8)
