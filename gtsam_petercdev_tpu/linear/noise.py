"""Noise models and robust loss functions.

The reference's NoiseModel hierarchy (gtsam/linear/NoiseModel.h:42-746:
Gaussian / Diagonal / Constrained / Isotropic / Unit / Robust) collapses here
into ONE dense batched representation: a square-root information matrix
`sqrt_info [..., d, d]` such that whitened = sqrt_info @ raw and
Sigma^{-1} = sqrt_info^T sqrt_info. Diagonal/Isotropic/Unit are constructors
that fill the dense form — block dims are tiny (1-15), so the uniform dense
layout is what lets all whitening ride one batched matmul on the MXU.

Constrained models (sigma == 0 rows, NoiseModel.h:260) have two treatments:
`diagonal_sigmas` applies a large-but-finite weight (mu penalty), while
`constrained_sigmas` / `constrained_all` flag the rows for the EXACT
nullspace-QR solve in linear/qr.py — the TPU-native equivalent of the
reference's staggered constrained QR (NoiseModel.cpp:503), which eliminates
the equality constraints analytically instead of row-staggering a host QR.

Robust m-estimators (gtsam/linear/LossFunctions.h) are pure weight functions
w(||r||) applied as IRLS row scaling at linearization time, matching
Robust::WhitenSystem semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

DEFAULT_CONSTRAINED_MU = 1e4  # sqrt weight for sigma==0 rows


def isotropic(dim: int, sigma: float, dtype=np.float32) -> np.ndarray:
    """Isotropic(sigma): sqrt_info = I/sigma (NoiseModel.h Isotropic).

    Host numpy on purpose (all noise constructors): sqrt_info is factor
    data, stored host-side so jit tracing embeds it as a constant."""
    return np.eye(dim, dtype=dtype) / sigma


def unit(dim: int, dtype=np.float32) -> np.ndarray:
    return np.eye(dim, dtype=dtype)


def diagonal_sigmas(sigmas, mu: float = DEFAULT_CONSTRAINED_MU) -> np.ndarray:
    """Diagonal::Sigmas; sigma==0 rows become hard-ish constraints (weight mu)."""
    sigmas = np.asarray(sigmas)
    w = np.where(sigmas == 0.0, mu, 1.0 / np.where(sigmas == 0.0, 1.0, sigmas))
    d = sigmas.shape[-1]
    return w[..., :, None] * np.eye(d, dtype=sigmas.dtype)


def constrained_sigmas(sigmas):
    """Diagonal::Sigmas with EXACT sigma==0 constraints (NoiseModel.h:260).

    Returns (sqrt_info, constrained_mask): constrained rows carry weight 1
    (the raw residual row IS the constraint equation c(x)=0) and the mask
    flags them for the exact constrained-QR solve (linear/qr.py) — the
    TPU-native analog of the reference's staggered constrained QR
    (gtsam/linear/NoiseModel.cpp:503). Pass both to
    NonlinearFactorGraph.add(..., constrained_mask=mask).
    """
    sigmas = np.asarray(sigmas)
    mask = sigmas == 0.0
    w = np.where(mask, 1.0, 1.0 / np.where(mask, 1.0, sigmas))
    d = sigmas.shape[-1]
    return w[..., :, None] * np.eye(d, dtype=sigmas.dtype), mask


def constrained_all(dim: int, dtype=np.float64):
    """Constrained::All — every row an exact equality (NonlinearEquality)."""
    return np.eye(dim, dtype=dtype), np.ones(dim, dtype=bool)


def diagonal_precisions(precisions) -> np.ndarray:
    p = np.asarray(precisions)
    d = p.shape[-1]
    return np.sqrt(p)[..., :, None] * np.eye(d, dtype=p.dtype)


def gaussian_information(info) -> jnp.ndarray:
    """Gaussian::Information — sqrt_info = chol(Info)^T so that R^T R = Info."""
    info = np.asarray(info)
    dtype = info.dtype if info.dtype in (np.float32, np.float64) else np.float64
    info = 0.5 * (info + np.swapaxes(info, -1, -2))
    # Tolerate PSD-with-zeros information (e.g. g2o files with partial info).
    d = info.shape[-1]
    jitter = (1e-12 if dtype == np.float64 else 1e-6) * np.eye(d, dtype=dtype)
    L = np.linalg.cholesky((info + jitter).astype(dtype))
    # host numpy on purpose: sqrt_info is factor data, stored host-side so
    # jit tracing embeds it as a constant without a device fetch
    return np.swapaxes(L, -1, -2)


def gaussian_covariance(cov) -> jnp.ndarray:
    return gaussian_information(np.linalg.inv(np.asarray(cov)))


# --- robust losses (gtsam/linear/LossFunctions.h) ---------------------------
# Each loss is (loss(e), weight(e)) of the residual norm e = ||whitened r||.
# weight is the IRLS factor applied to rows: sqrt(w) scaling of (A, b).


@dataclass(frozen=True)
class RobustLoss:
    name: str
    k: float = 1.0

    def weight(self, e: jnp.ndarray) -> jnp.ndarray:
        k = self.k
        ae = jnp.abs(e)
        safe = jnp.where(ae < 1e-12, 1e-12, ae)
        if self.name == "huber":
            return jnp.where(ae <= k, 1.0, k / safe)
        if self.name == "cauchy":
            return k * k / (k * k + e * e)
        if self.name == "tukey":
            u = 1.0 - (e / k) ** 2
            return jnp.where(ae <= k, u * u, 0.0)
        if self.name == "geman_mcclure":
            return (k**4) / (k * k + e * e) ** 2
        if self.name == "welsch":
            return jnp.exp(-(e * e) / (k * k))
        if self.name == "fair":
            return 1.0 / (1.0 + safe / k)
        if self.name == "dcs":
            # Dynamic covariance scaling: w = min(1, 2k/(k+e^2))
            return jnp.minimum(1.0, 2.0 * k / (k + e * e))
        if self.name == "l2":
            return jnp.ones_like(e)
        raise ValueError(f"unknown robust loss {self.name}")

    def loss(self, e: jnp.ndarray) -> jnp.ndarray:
        """rho(e) with rho'(e)/e = weight; used for graph error reporting."""
        k = self.k
        ae = jnp.abs(e)
        if self.name == "huber":
            return jnp.where(ae <= k, 0.5 * e * e, k * (ae - 0.5 * k))
        if self.name == "cauchy":
            return 0.5 * k * k * jnp.log1p(e * e / (k * k))
        if self.name == "tukey":
            u = 1.0 - (e / k) ** 2
            inside = (k * k / 6.0) * (1.0 - u**3)
            return jnp.where(ae <= k, inside, k * k / 6.0)
        if self.name == "geman_mcclure":
            return 0.5 * (k * k * e * e) / (k * k + e * e)
        if self.name == "welsch":
            return 0.5 * k * k * (1.0 - jnp.exp(-(e * e) / (k * k)))
        if self.name == "fair":
            return k * k * (ae / k - jnp.log1p(ae / k))
        if self.name == "dcs":
            w = jnp.minimum(1.0, 2.0 * k / (k + e * e))
            return 0.5 * w * e * e  # Agarwal'13 scaled form
        if self.name == "l2":
            return 0.5 * e * e
        raise ValueError(f"unknown robust loss {self.name}")


def huber(k: float = 1.345) -> RobustLoss:
    return RobustLoss("huber", k)


def cauchy(k: float = 0.1) -> RobustLoss:
    return RobustLoss("cauchy", k)


def tukey(k: float = 4.6851) -> RobustLoss:
    return RobustLoss("tukey", k)


def geman_mcclure(k: float = 1.0) -> RobustLoss:
    return RobustLoss("geman_mcclure", k)


def welsch(k: float = 2.9846) -> RobustLoss:
    return RobustLoss("welsch", k)


def fair(k: float = 1.3998) -> RobustLoss:
    return RobustLoss("fair", k)


def dcs(k: float = 1.0) -> RobustLoss:
    return RobustLoss("dcs", k)
