"""Shonan rotation averaging: certifiably-optimal SO(3) synchronization.

Reference: gtsam/sfm/ShonanAveraging.{h,cpp}:123-438 — the Riemannian
staircase: at each rank p >= 3, optimize the lifted problem over SO(p)
(ShonanFactor = Frobenius norm between lifted rotations), then check global
optimality with the minimum eigenvalue of the dual certificate matrix
S = L - Lambda (computed via Spectra / accelerated power method,
PowerMethod.h / AcceleratedPowerMethod.h); if certified, round the solution
back to SO(3) (roundSolutionS).

TPU-native: each staircase level is a standard batched LM solve in this
framework over a dynamically registered SO(p) manifold (tangent p(p-1)/2,
retract Q expm(hat(xi)) with jax.scipy.linalg.expm); the certificate's
min-eigenvalue uses a matrix-free shifted power iteration over the edge list
(one segment-sum per iteration — no sparse matrix materialized).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


# --- SO(p) manifold (dynamic registration per staircase level) ---------------


def _son_hat(xi, p: int):
    """[p(p-1)/2] -> skew [p,p]; basis ordered (i<j) row-major."""
    rows, cols = np.triu_indices(p, k=1)
    S = jnp.zeros(xi.shape[:-1] + (p, p), dtype=xi.dtype)
    S = S.at[..., rows, cols].set(xi)
    S = S.at[..., cols, rows].add(-xi)
    return S


def _son_vee(S, p: int):
    rows, cols = np.triu_indices(p, k=1)
    return S[..., rows, cols]


def _expm_series(S, squarings: int = 8, terms: int = 7):
    """Batched, everywhere-differentiable matrix exponential by fixed
    scaling-and-squaring + Taylor (p is tiny, matmuls only — MXU friendly).
    Error ~ (||S||/2^s)^terms / terms! — negligible for ||S|| <~ 10."""
    T = S / (2.0**squarings)
    p_ = T.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(p_, dtype=S.dtype), S.shape)
    out = eye
    term = eye
    for k in range(1, terms + 1):
        term = jnp.einsum("...ij,...jk->...ik", term, T) / k
        out = out + term
    for _ in range(squarings):
        out = jnp.einsum("...ij,...jk->...ik", out, out)
    return out


def register_son(p: int) -> str:
    """Register SO(p) as a manifold type 'SOn{p}' (params [p,p])."""
    name = f"SOn{p}"
    if name in manifold.registered():
        return name
    dim = p * (p - 1) // 2

    def retract(Q, xi):
        return jnp.einsum("...ij,...jk->...ik", Q, _expm_series(_son_hat(xi, p)))

    def local(Q1, Q2):
        # log of Q1^T Q2 via expm-based approx: use first-order skew part of
        # the matrix log (adequate for convergence checks; optimizer uses
        # retract only)
        M = jnp.swapaxes(Q1, -1, -2) @ Q2
        S = 0.5 * (M - jnp.swapaxes(M, -1, -2))
        return _son_vee(S, p)

    manifold.register(
        manifold.ManifoldType(
            name=name,
            dim=dim,
            retract=retract,
            local=local,
            identity=lambda dtype=jnp.float64: jnp.eye(p, dtype=dtype),
        )
    )
    return name


# --- measurements ------------------------------------------------------------


@dataclass
class ShonanMeasurements:
    """Edge list (i, j, R_ij, kappa): R_j ~ R_i R_ij with concentration kappa
    (BinaryMeasurement<Rot3> with isotropic Langevin noise)."""

    i: np.ndarray  # [E]
    j: np.ndarray  # [E]
    R: jnp.ndarray  # [E, 3, 3]
    kappa: jnp.ndarray  # [E]

    @property
    def num_edges(self) -> int:
        return len(self.i)

    @property
    def num_nodes(self) -> int:
        return int(max(self.i.max(), self.j.max())) + 1


def measurements_from_between_graph(graph) -> ShonanMeasurements:
    """Extract rotation measurements from BetweenPose3 factors
    (ShonanAveraging::makeNoiseModelRobust / extractRotations)."""
    graph._materialize()
    iks, jks, Rs, ks = [], [], [], []
    for b in graph.batches:
        if b.ftype.name.startswith("BetweenPose3"):
            iks.append(b.keys[:, 0].astype(np.int64))
            jks.append(b.keys[:, 1].astype(np.int64))
            Rs.append(b.params.R)
            # kappa from the rotation block of sqrt_info (approximate:
            # mean squared row norm of the first 3 rows)
            si = b.sqrt_info[:, :3, :3]
            ks.append(jnp.mean(jnp.sum(si * si, axis=-1), axis=-1))
    return ShonanMeasurements(
        np.concatenate(iks), np.concatenate(jks),
        jnp.concatenate(Rs, axis=0), jnp.concatenate(ks, axis=0),
    )


# --- lifted optimization at level p ------------------------------------------


def _shonan_factor(p: int) -> FactorType:
    """vec(M_j - M_i R_ij), M = Q[:, :3] — FrobeniusShonanFactor
    (sfm/ShonanFactor.h). Residual dim 3p."""
    name = register_son(p)

    def residual(xs, params):
        Qi, Qj = xs
        Rij = params
        Mi = Qi[:, :3]
        Mj = Qj[:, :3]
        return (Mj - Mi @ Rij).reshape(-1)

    return FactorType(
        name=f"Shonan{p}", var_types=(name, name), resid_dim=3 * p, residual=residual
    )


def _gauge_factor(p: int) -> FactorType:
    """Weak prior pinning node 0 to the identity lift (removes the global
    O(p) gauge like ShonanGaugeFactor)."""
    name = f"SOn{p}"

    def residual(xs, params):
        (Q,) = xs
        return (Q[:, :3] - params).reshape(-1)

    return FactorType(
        name=f"ShonanGauge{p}", var_types=(name,), resid_dim=3 * p, residual=residual
    )


def optimize_at_p(
    m: ShonanMeasurements,
    p: int,
    Q_init: jnp.ndarray,  # [N, p, p]
    lm_params: Optional[optimizers.LMParams] = None,
) -> Tuple[Values, float]:
    """tryOptimizingAt(p) (ShonanAveraging.h:351): LM on the lifted graph."""
    name = register_son(p)
    dtype = Q_init.dtype
    N = Q_init.shape[0]
    values = Values()
    for i in range(N):
        values.insert(i, name, Q_init[i])
    graph = NonlinearFactorGraph()
    E = m.num_edges
    sqrt_k = jnp.sqrt(m.kappa)
    si = sqrt_k[:, None, None] * jnp.eye(3 * p, dtype=dtype)[None]
    graph.add_batch(
        _shonan_factor(p), np.stack([m.i, m.j], axis=1), jnp.asarray(m.R, dtype=dtype), si
    )
    anchor = jnp.eye(p, dtype=dtype)[:, :3]
    graph.add(_gauge_factor(p), [0], anchor, noise.isotropic(3 * p, 10.0, dtype))
    params = lm_params or optimizers.LMParams(
        max_iterations=60, solver="pcg", pcg_max_iters=500, pcg_tol=1e-10
    )
    res = optimizers.levenberg_marquardt(graph, values, params)
    return res.values, res.error


# --- certificate -------------------------------------------------------------


def _connection_laplacian_matvec(m: ShonanMeasurements, N: int):
    """Matrix-free v -> L v for the 3Nx3N connection Laplacian L
    (ShonanAveraging::buildQ): L[ii] += k I, L[jj] += k I,
    L[ij] -= k R_ij, L[ji] -= k R_ij^T."""
    i = jnp.asarray(m.i)
    j = jnp.asarray(m.j)
    R = m.R
    k = m.kappa

    def matvec(V):  # V: [N, 3, c]
        Vi = V[i]
        Vj = V[j]
        kc = k[:, None, None]
        out = jnp.zeros_like(V)
        out = out.at[i].add(kc * Vi - kc * jnp.einsum("eab,ebc->eac", R, Vj))
        out = out.at[j].add(
            kc * Vj - kc * jnp.einsum("eba,ebc->eac", R, Vi)
        )
        return out

    return matvec


def certificate_min_eigenvalue(
    m: ShonanMeasurements,
    Y: jnp.ndarray,  # [N, 3, p] solution blocks (M_i^T = Q[:, :3]^T rows)
    iters: int = 300,
    seed: int = 0,
) -> float:
    """lambda_min(S), S = L - blockdiag(Lambda), Lambda_i = sym((L Y)_i Y_i^T)
    (computeMinEigenValue, ShonanAveraging.h:253-260; SE-Sync certificate).

    Shifted power iteration: largest eigenvalue of (c I - S) gives
    c - lambda_min; c from a Gershgorin bound. Matrix-free throughout.
    """
    N = Y.shape[0]
    dtype = Y.dtype
    Lmv = _connection_laplacian_matvec(m, N)
    LY = Lmv(Y)  # [N, 3, p]
    Lam = jnp.einsum("nap,nbp->nab", LY, Y)
    Lam = 0.5 * (Lam + jnp.swapaxes(Lam, -1, -2))  # [N, 3, 3]

    def Smv(V):  # [N,3,c]
        return Lmv(V) - jnp.einsum("nab,nbc->nac", Lam, V)

    # Gershgorin-style bound on ||S||: 2*max_i (sum of incident kappas) + ||Lam||
    deg = np.zeros(N)
    kk = np.asarray(m.kappa)
    np.add.at(deg, np.asarray(m.i), kk)
    np.add.at(deg, np.asarray(m.j), kk)
    c = 2.0 * float(deg.max()) + float(jnp.max(jnp.abs(Lam))) * 3.0 + 1.0

    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.normal(size=(N, 3, 1)), dtype=dtype)
    v = v / jnp.sqrt(jnp.sum(v * v))

    def body(_, v):
        w = c * v - Smv(v)
        return w / jnp.sqrt(jnp.sum(w * w) + 1e-300)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = c * v - Smv(v)
    lam_max_shifted = float(jnp.sum(v * w))
    return c - lam_max_shifted  # = lambda_min(S)


# --- rounding ----------------------------------------------------------------


def round_solution(Q: jnp.ndarray) -> jnp.ndarray:
    """[N, p, p] lifted -> [N, 3, 3] SO(3) (roundSolutionS, .h:264,363):
    rank-3 SVD of the stacked Stiefel blocks, per-block SO(3) projection,
    majority-det sign fix."""
    N, p, _ = Q.shape
    M = Q[:, :, :3]  # [N, p, 3] Stiefel blocks
    Y = M.transpose(0, 2, 1).reshape(3 * N, p)  # rows = M_i^T stacked
    U, s, Vt = jnp.linalg.svd(Y, full_matrices=False)
    Y3 = U[:, :3] * s[None, :3]  # [3N, 3]; block_i ~ M_i^T W, W in O(3)
    blocks = Y3.reshape(N, 3, 3)
    # majority det decides the global reflection of W
    mean_det = jnp.mean(jnp.linalg.det(blocks))
    blocks = jnp.where(mean_det < 0, blocks.at[:, :, 2].multiply(-1.0), blocks)
    # project each to SO(3) and undo the transposition (blocks are R_i^T W)
    Ub, _, Vbt = jnp.linalg.svd(blocks)
    det = jnp.linalg.det(jnp.einsum("nij,njk->nik", Ub, Vbt))
    S = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    R = jnp.einsum("nij,nj,njk->nik", Ub, S, Vbt)
    R = jnp.swapaxes(R, -1, -2)
    # global left-gauge: R_i <- R_0^T R_i so that R_0 = I (measurements
    # R_j = R_i R_ij are invariant to left multiplication)
    R0inv = jnp.swapaxes(R[0], -1, -2)
    return jnp.einsum("ij,njk->nik", R0inv, R)


@dataclass
class ShonanResult:
    rotations: jnp.ndarray  # [N, 3, 3]
    p_final: int
    min_eigenvalue: float
    certified: bool
    cost: float


def shonan_averaging(
    m: ShonanMeasurements,
    p_min: int = 3,
    p_max: int = 6,
    optimality_threshold: float = -1e-4,
    R_init: Optional[jnp.ndarray] = None,
    lm_params: Optional[optimizers.LMParams] = None,
    seed: int = 0,
    dtype=jnp.float64,
) -> ShonanResult:
    """ShonanAveraging::run (ShonanAveraging.h:404): the Riemannian staircase."""
    N = m.num_nodes
    rng = np.random.default_rng(seed)
    if R_init is None:
        # random init (::initializeRandomly)
        R_init = so3.expmap(jnp.asarray(rng.normal(size=(N, 3)) * 1.0, dtype=dtype))

    lam_min = -np.inf
    Qsol = None
    p_used = p_min
    cost = np.nan
    for p in range(p_min, p_max + 1):
        # lift: Q = [[R, 0], [0, I]] (+ random perturbation in the new rows)
        Q0 = jnp.zeros((N, p, p), dtype=dtype)
        Q0 = Q0.at[:, :3, :3].set(jnp.asarray(R_init, dtype=dtype))
        for d in range(3, p):
            Q0 = Q0.at[:, d, d].set(1.0)
        if p > p_min:
            # perturb along the new dimension to escape the saddle
            name = register_son(p)
            xi = jnp.asarray(
                rng.normal(size=(N, p * (p - 1) // 2)) * 0.01, dtype=dtype
            )
            Q0 = manifold.get(name).retract(Q0, xi)

        vals, cost = optimize_at_p(m, p, Q0, lm_params)
        name = f"SOn{p}"
        Qsol = vals.params(name)  # [N, p, p]
        Y = Qsol[:, :, :3].transpose(0, 2, 1)  # [N, 3, p] = M_i^T
        lam_min = certificate_min_eigenvalue(m, Y, seed=seed)
        R_round = round_solution(Qsol)
        if lam_min >= optimality_threshold:
            return ShonanResult(R_round, p, lam_min, True, cost)
        R_init = R_round  # initialize next level from the rounded solution
        p_used = p
    return ShonanResult(round_solution(Qsol), p_used, lam_min, False, cost)
