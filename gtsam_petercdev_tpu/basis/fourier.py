"""Fourier basis (reference: gtsam/basis/Fourier.h FourierBasis).

Weight-row convention matches the reference: for N coefficients,
[1, cos(x), sin(x), cos(2x), sin(2x), ...] truncated to N entries, so a
fitted function is f(x) = W(x) @ c. Derivatives are exact rows too.
"""

from __future__ import annotations

import jax.numpy as jnp


def fourier_weights(N: int, x):
    """Evaluation row [..., N]: 1, cos x, sin x, cos 2x, sin 2x, ..."""
    x = jnp.asarray(x)
    cols = [jnp.ones_like(x)]
    k = 1
    while len(cols) < N:
        cols.append(jnp.cos(k * x))
        if len(cols) < N:
            cols.append(jnp.sin(k * x))
        k += 1
    return jnp.stack(cols, axis=-1)


def fourier_derivative_weights(N: int, x):
    """d/dx of fourier_weights: 0, -k sin kx, k cos kx, ..."""
    x = jnp.asarray(x)
    cols = [jnp.zeros_like(x)]
    k = 1
    while len(cols) < N:
        cols.append(-k * jnp.sin(k * x))
        if len(cols) < N:
            cols.append(k * jnp.cos(k * x))
        k += 1
    return jnp.stack(cols, axis=-1)
