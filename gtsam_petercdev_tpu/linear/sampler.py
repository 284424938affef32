"""Sampler: draw Gaussian samples consistent with a noise model.

Reference: gtsam/linear/Sampler.{h,cpp} — samples eps with
cov(eps) = Sigma for a Diagonal model (sigmas * N(0, I)) and, generally,
solves R eps = z for a full sqrt-information model. JAX PRNG keys replace
the reference's mutable std::mt19937 state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_diagonal(key, sigmas, shape=()):
    """eps ~ N(0, diag(sigmas^2)); shape prepends batch dims
    (Sampler::sampleDiagonal)."""
    sigmas = jnp.asarray(sigmas)
    z = jax.random.normal(key, shape + sigmas.shape, dtype=sigmas.dtype)
    return z * sigmas


def sample_sqrt_info(key, sqrt_info, shape=()):
    """eps with sqrt_info @ eps ~ N(0, I): solve R eps = z (general
    Gaussian noise model; Sampler::sample on a non-diagonal model)."""
    R = jnp.asarray(sqrt_info)
    d = R.shape[-1]
    z = jax.random.normal(key, shape + (d,), dtype=R.dtype)
    return jnp.linalg.solve(
        jnp.broadcast_to(R, shape + R.shape[-2:]), z[..., None]
    )[..., 0]
