"""Pose-graph initialization: chordal relaxation (3D) and LAGO (2D).

Reference:
  InitializePose3 (gtsam/slam/InitializePose3.{h,cpp}:45-91) — solve the
  chordal relaxation of rotation synchronization as a LINEAR least-squares
  problem over the 9 entries of each rotation matrix, project back onto
  SO(3) via SVD, then recover translations from a second linear solve.
  lago (gtsam/slam/lago.{h,cpp}:42-92) — 2D orientation-first init: correct
  relative-angle measurements for 2*pi winding using a spanning tree, solve
  the resulting linear orientation system, then linear positions.

TPU-native: both reduce to batched linear least squares; here they are
solved matrix-free with the block-Jacobi PCG over the same SoA factor
batches the rest of the framework uses (one `vmap`ed residual per edge
type). The SO(3) projection is one batched SVD.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values

# register flat vector manifolds used by the relaxations
if "Vector9" not in manifold.registered():
    manifold.register(manifold.vector_space("Vector9", 9))


def _extract_pose3_edges(graph: NonlinearFactorGraph):
    """(i_keys, j_keys, measured Pose3 batch) from BetweenPose3 batches."""
    graph._materialize()
    iks, jks, Rms, tms = [], [], [], []
    for b in graph.batches:
        if b.ftype.name.startswith("BetweenPose3"):
            iks.append(b.keys[:, 0])
            jks.append(b.keys[:, 1])
            Rms.append(b.params.R)
            tms.append(b.params.t)
    if not iks:
        raise ValueError("no BetweenPose3 factors in graph")
    return (
        np.concatenate(iks),
        np.concatenate(jks),
        jnp.concatenate(Rms, axis=0),
        jnp.concatenate(tms, axis=0),
    )


def _chordal_factor() -> FactorType:
    """Linear factor on 9D rotation-entry vectors: rows of R_j must equal
    rows of R_i rotated by measured R_ij (InitializePose3::buildLinearOrientationGraph)."""

    def residual(xs, params):
        xi, xj = xs  # [9] each: rows of R stacked
        Rij = params  # [3,3]
        Ri = xi.reshape(3, 3)
        Rj = xj.reshape(3, 3)
        return (Rj - Ri @ Rij).reshape(9)

    return FactorType(
        name="Chordal9",
        var_types=("Vector9", "Vector9"),
        resid_dim=9,
        residual=residual,
    )


def _anchor9_factor() -> FactorType:
    def residual(xs, params):
        (x,) = xs
        return x - params

    return FactorType(
        name="Anchor9", var_types=("Vector9",), resid_dim=9, residual=residual
    )


def initialize_pose3_chordal(
    graph: NonlinearFactorGraph,
    anchor_key: Optional[int] = None,
    pcg_tol: float = 1e-8,
    pcg_max_iters: int = 2000,
    dtype=jnp.float64,
) -> Values:
    """Chordal initialization of a Pose3 pose graph (InitializePose3.h:45-91).

    Returns a Values with Pose3 estimates for every key touched by a
    BetweenPose3 factor.
    """
    ik, jk, Rm, tm = _extract_pose3_edges(graph)
    keys = sorted(set(int(k) for k in np.concatenate([ik, jk])))
    if anchor_key is None:
        anchor_key = keys[0]

    # --- stage 1: rotations (linear 9D relaxation) -----------------------
    rot_graph = NonlinearFactorGraph()
    rot_vals = Values()
    eye9 = jnp.eye(3, dtype=dtype).reshape(9)
    for k in keys:
        rot_vals.insert(k, "Vector9", eye9)
    rot_graph.add_batch(
        _chordal_factor(),
        np.stack([ik, jk], axis=1),
        jnp.asarray(Rm, dtype=dtype),
        jnp.eye(9, dtype=dtype),
    )
    rot_graph.add(
        _anchor9_factor(), [anchor_key], eye9, noise.isotropic(9, 1e-3, dtype)
    )
    rot_graph._materialize()

    lg = rot_graph.linearize(rot_vals)
    delta = linsolve.pcg_solve(lg, tol=pcg_tol, max_iters=pcg_max_iters)
    x9 = rot_vals.params("Vector9") + delta["Vector9"]  # [N, 9]

    # project to SO(3): R = U diag(1,1,det(UV^T)) V^T (Frobenius-closest)
    M = x9.reshape(-1, 3, 3)
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    R = jnp.einsum("nij,nj,njk->nik", U, S, Vt)

    row_of = {k: r for r, k in enumerate(keys)}

    # --- stage 2: translations (linear, rotations fixed) ------------------
    # t_j - t_i = R_i t_ij  (InitializePose3::computePoses GN on translations)
    def t_residual(xs, params):
        ti, tj = xs
        Ri, tij = params
        return tj - ti - Ri @ tij

    t_factor = FactorType(
        name="ChordalT",
        var_types=("Point3", "Point3"),
        resid_dim=3,
        residual=t_residual,
    )
    Ri_per_edge = R[np.asarray([row_of[int(k)] for k in ik])]
    t_graph = NonlinearFactorGraph()
    t_vals = Values()
    z3 = jnp.zeros(3, dtype=dtype)
    for k in keys:
        t_vals.insert(k, "Point3", z3)
    t_graph.add_batch(
        t_factor,
        np.stack([ik, jk], axis=1),
        (Ri_per_edge, jnp.asarray(tm, dtype=dtype)),
        jnp.eye(3, dtype=dtype),
    )

    def anchor_t(xs, params):
        (x,) = xs
        return x - params

    t_graph.add(
        FactorType("AnchorT", ("Point3",), 3, anchor_t),
        [anchor_key],
        z3,
        noise.isotropic(3, 1e-3, dtype),
    )
    t_graph._materialize()
    lgt = t_graph.linearize(t_vals)
    dt = linsolve.pcg_solve(lgt, tol=pcg_tol, max_iters=pcg_max_iters)
    t = t_vals.params("Point3") + dt["Point3"]

    out = Values()
    for k in keys:
        r = row_of[k]
        out.insert(k, "Pose3", Pose3(R[r], t[r]))
    return out


# --- LAGO (2D) ---------------------------------------------------------------


def _extract_pose2_edges(graph: NonlinearFactorGraph):
    graph._materialize()
    iks, jks, ms = [], [], []
    for b in graph.batches:
        if b.ftype.name.startswith("BetweenPose2"):
            iks.append(b.keys[:, 0])
            jks.append(b.keys[:, 1])
            ms.append(np.asarray(b.params))
    if not iks:
        raise ValueError("no BetweenPose2 factors in graph")
    return np.concatenate(iks), np.concatenate(jks), np.concatenate(ms, axis=0)


def initialize_pose2_lago(
    graph: NonlinearFactorGraph, anchor_key: Optional[int] = None, dtype=jnp.float64
) -> Values:
    """LAGO 2D initialization (gtsam/slam/lago.h:42-92).

    1. spanning tree (BFS on the host) gives winding-consistent orientation
       guesses; each loop-closure angle is regularized to the nearest
       2*pi-compatible value (lago::computeThetasToRoot).
    2. linear least squares over all orientation constraints.
    3. linear least squares for positions with fixed orientations.
    """
    ik, jk, m = _extract_pose2_edges(graph)
    keys = sorted(set(int(k) for k in np.concatenate([ik, jk])))
    row_of = {k: r for r, k in enumerate(keys)}
    n = len(keys)
    if anchor_key is None:
        anchor_key = keys[0]

    # BFS spanning tree orientation accumulation
    adj: Dict[int, list] = {k: [] for k in keys}
    for e in range(len(ik)):
        adj[int(ik[e])].append((int(jk[e]), float(m[e, 2]), +1))
        adj[int(jk[e])].append((int(ik[e]), float(m[e, 2]), -1))
    theta_tree = np.full(n, np.nan)
    theta_tree[row_of[anchor_key]] = 0.0
    from collections import deque

    q = deque([anchor_key])
    while q:
        u = q.popleft()
        for (v, dth, sgn) in adj[u]:
            if np.isnan(theta_tree[row_of[v]]):
                theta_tree[row_of[v]] = theta_tree[row_of[u]] + sgn * dth
                q.append(v)

    # regularized linear orientation system: theta_j - theta_i = dtheta + 2*pi*k
    ri = np.asarray([row_of[int(k)] for k in ik])
    rj = np.asarray([row_of[int(k)] for k in jk])
    pred = theta_tree[rj] - theta_tree[ri]
    dth = m[:, 2] + 2 * np.pi * np.round((pred - m[:, 2]) / (2 * np.pi))

    # solve sparse LS with numpy normal equations (n x n; orientation-only)
    A_rows = len(ik) + 1
    H = np.zeros((n, n))
    g = np.zeros(n)
    for e in range(len(ik)):
        i, j = ri[e], rj[e]
        H[i, i] += 1.0
        H[j, j] += 1.0
        H[i, j] -= 1.0
        H[j, i] -= 1.0
        g[i] -= dth[e]
        g[j] += dth[e]
    a = row_of[anchor_key]
    H[a, a] += 1e6
    theta = np.linalg.solve(H, g)

    # positions: t_j - t_i = R(theta_i) dt_ij — linear LS in 2n unknowns
    H2 = np.zeros((2 * n, 2 * n))
    g2 = np.zeros(2 * n)
    c, s = np.cos(theta[ri]), np.sin(theta[ri])
    dx = c * m[:, 0] - s * m[:, 1]
    dy = s * m[:, 0] + c * m[:, 1]
    for e in range(len(ik)):
        i, j = ri[e], rj[e]
        for d_, rhs in ((0, dx[e]), (1, dy[e])):
            ii, jj = 2 * i + d_, 2 * j + d_
            H2[ii, ii] += 1.0
            H2[jj, jj] += 1.0
            H2[ii, jj] -= 1.0
            H2[jj, ii] -= 1.0
            g2[ii] -= rhs
            g2[jj] += rhs
    H2[2 * a, 2 * a] += 1e6
    H2[2 * a + 1, 2 * a + 1] += 1e6
    t = np.linalg.solve(H2, g2).reshape(n, 2)

    out = Values()
    for k in keys:
        r = row_of[k]
        out.insert(
            k,
            "Pose2",
            jnp.asarray([t[r, 0], t[r, 1], np.arctan2(np.sin(theta[r]), np.cos(theta[r]))], dtype=dtype),
        )
    return out
