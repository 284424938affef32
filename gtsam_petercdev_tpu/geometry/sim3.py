"""Sim(3): similarity transforms (scale-drift-aware SLAM).

Reference: gtsam/geometry/Similarity3.{h,cpp} — action p -> s*R*p + t,
tangent ordering (omega, v, lambda) (Similarity3::Logmap).

Representation: NamedTuple Sim3(R [...,3,3], t [...,3], s [...]).
Exp/log use the closed-form generator series for the Sim(3) "W" matrix
(Sum A^n/(n+1)!, A = hat(omega) + lambda*I) — everywhere differentiable
(no eigendecompositions), batched, MXU-friendly matmuls only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import so3


class Sim3(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]
    s: jnp.ndarray  # [...]


DIM = 7


def identity(dtype=jnp.float32):
    return Sim3(jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), jnp.ones((), dtype=dtype))


def transform_from(g: Sim3, p):
    """p -> s R p + t (Similarity3::transformFrom)."""
    return g.s[..., None] * so3.rotate(g.R, p) + g.t


def compose(a: Sim3, b: Sim3) -> Sim3:
    return Sim3(
        a.R @ b.R,
        a.s[..., None] * so3.rotate(a.R, b.t) + a.t,
        a.s * b.s,
    )


def inverse(g: Sim3) -> Sim3:
    Rinv = so3.inverse(g.R)
    sinv = 1.0 / g.s
    return Sim3(Rinv, -sinv[..., None] * so3.rotate(Rinv, g.t), sinv)


def between(a: Sim3, b: Sim3) -> Sim3:
    return compose(inverse(a), b)


def _W(w, lam, terms: int = 20):
    """W = Sum_{n>=0} A^n / (n+1)!, A = hat(w) + lam I  (so t = W v).

    Converges rapidly for the tangent magnitudes seen in optimization."""
    A = so3.hat(w) + lam[..., None, None] * jnp.eye(3, dtype=w.dtype)
    out = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), A.shape)
    term = out
    fact = 1.0
    for n in range(1, terms + 1):
        term = jnp.einsum("...ij,...jk->...ik", term, A)
        fact *= n + 1
        out = out + term / fact
    return out


def expmap(xi) -> Sim3:
    """xi [...,7] = (omega, v, lambda) -> Sim3."""
    w, v, lam = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3.expmap(w)
    s = jnp.exp(lam)
    t = jnp.einsum("...ij,...j->...i", _W(w, lam), v)
    return Sim3(R, t, s)


def logmap(g: Sim3):
    w = so3.logmap(g.R)
    lam = jnp.log(g.s)
    W = _W(w, lam)
    v = jnp.linalg.solve(W, g.t[..., None])[..., 0]
    return jnp.concatenate([w, v, lam[..., None]], axis=-1)


def retract(g: Sim3, xi) -> Sim3:
    return compose(g, expmap(xi))


def local(a: Sim3, b: Sim3):
    return logmap(between(a, b))


def matrix(g: Sim3):
    """[[s R, t], [0, 1]] homogeneous form."""
    batch = g.t.shape[:-1]
    top = jnp.concatenate([g.s[..., None, None] * g.R, g.t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=g.t.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)
