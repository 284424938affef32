"""SO(2): planar rotations, stored as the angle theta (array [...]).

Mirrors gtsam/geometry/Rot2.h semantics; tangent dim 1.
"""

from __future__ import annotations

import jax.numpy as jnp

DIM = 1


def wrap(theta):
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def identity(dtype=jnp.float32):
    return jnp.zeros((), dtype=dtype)


def compose(a, b):
    return wrap(a + b)


def inverse(a):
    return -a


def between(a, b):
    return wrap(b - a)


def expmap(w):
    return wrap(w[..., 0])


def logmap(a):
    return wrap(a)[..., None]


def retract(a, w):
    return wrap(a + w[..., 0])


def local(a, b):
    return wrap(b - a)[..., None]


def matrix(a):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotate(a, p):
    c, s = jnp.cos(a), jnp.sin(a)
    return jnp.stack(
        [c * p[..., 0] - s * p[..., 1], s * p[..., 0] + c * p[..., 1]], axis=-1
    )


def unrotate(a, p):
    return rotate(-a, p)
