"""Chebyshev pseudospectral bases.

Reference: gtsam/basis/Chebyshev2.h:67-105 (Chebyshev2 = second-kind points,
barycentric interpolation weights, differentiation matrix, Clenshaw-Curtis
integration weights) and gtsam/basis/Chebyshev.h (Chebyshev1 polynomial
basis). All generators return dense row vectors / matrices so downstream
use is batched matmul — ideal for the MXU; no recursion at runtime.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def chebyshev2_points(N: int, a: float = -1.0, b: float = 1.0) -> np.ndarray:
    """N Chebyshev points of the second kind on [a, b] (Chebyshev2::Points).

    x_j = cos(j pi / (N-1)), j = N-1..0 mapped ascending onto [a, b].
    Host-side (np): points parameterize plans, not traced computation.
    """
    if N == 1:
        return np.array([(a + b) / 2.0])
    j = np.arange(N)
    x = np.cos(j * np.pi / (N - 1))[::-1]  # ascending in [-1, 1]
    return (a + b) / 2.0 + (b - a) / 2.0 * x


def _bary_sign_weights(N: int) -> np.ndarray:
    """Barycentric weights for Chebyshev-2 points: (-1)^j, halved endpoints."""
    w = np.ones(N)
    w[1::2] = -1.0
    w[0] *= 0.5
    w[-1] *= 0.5
    # points returned ascending = reversed cos ordering; flip sign pattern
    return w[::-1].copy()


def chebyshev2_weights(N: int, x, a: float = -1.0, b: float = 1.0):
    """Interpolation row W(x) with f(x) = W(x) @ f(points)  [..., N].

    Barycentric form (Chebyshev2::CalculateWeights). Exact-hit handling is
    done with jnp.where masks (no data-dependent branches, jit-safe).
    """
    pts = jnp.asarray(chebyshev2_points(N, a, b))
    sw = jnp.asarray(_bary_sign_weights(N))
    x = jnp.asarray(x)
    d = x[..., None] - pts  # [..., N]
    hit = jnp.abs(d) < 1e-12
    any_hit = jnp.any(hit, axis=-1, keepdims=True)
    frac = sw / jnp.where(hit, 1.0, d)
    w_off = frac / jnp.sum(frac, axis=-1, keepdims=True)
    w_on = hit.astype(w_off.dtype)
    return jnp.where(any_hit, w_on, w_off)


def chebyshev2_differentiation_matrix(
    N: int, a: float = -1.0, b: float = 1.0
) -> np.ndarray:
    """D [N,N] with f'(points) = D @ f(points) (Chebyshev2::DifferentiationMatrix).

    Standard spectral collocation matrix with negative-sum-trick diagonal.
    """
    if N == 1:
        return np.zeros((1, 1))
    pts = chebyshev2_points(N, a, b)
    w = _bary_sign_weights(N)
    X = pts[:, None] - pts[None, :]
    np.fill_diagonal(X, 1.0)
    D = (w[None, :] / w[:, None]) / X
    np.fill_diagonal(D, 0.0)
    np.fill_diagonal(D, -D.sum(axis=1))
    return D


def chebyshev2_derivative_weights(N: int, x, a: float = -1.0, b: float = 1.0):
    """Row vector W'(x) with f'(x) ~= W'(x) @ f(points).

    Composed as interpolation at x of the exact collocation derivative:
    W'(x) = W(x) @ D — spectrally accurate, and a pure matmul.
    """
    D = jnp.asarray(chebyshev2_differentiation_matrix(N, a, b))
    return chebyshev2_weights(N, x, a, b) @ D


def chebyshev2_integration_weights(
    N: int, a: float = -1.0, b: float = 1.0
) -> np.ndarray:
    """Clenshaw-Curtis quadrature weights (Chebyshev2::IntegrationWeights)."""
    if N == 1:
        return np.array([b - a])
    n = N - 1
    # weights on cos-ordered points, then flip to ascending
    c = np.zeros(N)
    theta = np.arange(N) * np.pi / n
    w = np.zeros(N)
    for j in range(N):
        s = 0.0
        for k in range(1, n // 2 + 1):
            term = 2.0 if 2 * k < n else 1.0
            s += term * np.cos(2 * k * theta[j]) / (4.0 * k * k - 1.0)
        w[j] = 1.0 - s
    w = w * 2.0 / n
    w[0] /= 2.0
    w[-1] /= 2.0
    return (w[::-1] * (b - a) / 2.0).copy()


def chebyshev1_weights(N: int, x, a: float = -1.0, b: float = 1.0):
    """Chebyshev polynomial (first kind) evaluation row: [T_0(t)..T_{N-1}(t)]
    at t = affine map of x to [-1,1] (gtsam/basis/Chebyshev.h Chebyshev1Basis).
    Closed form T_k(t) = cos(k arccos t): one trig call, fully batched."""
    x = jnp.asarray(x)
    t = jnp.clip((2.0 * x - (a + b)) / (b - a), -1.0, 1.0)
    k = jnp.arange(N)
    return jnp.cos(k * jnp.arccos(t)[..., None])
