"""Multi-view triangulation: DLT, LOST, nonlinear refinement, triangulateSafe.

Reference: gtsam/geometry/triangulation.h — triangulateDLT (:88),
triangulateLOST (:111), triangulateNonlinear (:191), triangulatePoint3 (:425),
triangulateSafe -> TriangulationResult (:644-674).

TPU-native design: everything operates on a FIXED number of views M per track
with a boolean validity mask, so one `vmap` triangulates thousands of tracks
at once with no dynamic shapes. The reference's exceptions
(TriangulationCheiralityException, ...) become integer status codes
(SURVEY §5.3 — masked status instead of exceptions inside jit).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.geometry import pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3

# TriangulationResult status codes (triangulation.h:644-674)
VALID = 0
DEGENERATE = 1
BEHIND_CAMERA = 2
OUTLIER = 3
FAR_POINT = 4


class TriangulationResult(NamedTuple):
    point: jnp.ndarray  # [..., 3]
    status: jnp.ndarray  # [...] int32, one of the codes above


class TriangulationParameters(NamedTuple):
    """triangulation.h TriangulationParameters."""

    rank_tolerance: float = 1e-9
    landmark_distance_threshold: float = -1.0  # <0: disabled
    dynamic_outlier_rejection_threshold: float = -1.0  # <0: disabled
    enable_epi: bool = False  # (reserved)


def triangulate_dlt(poses: Pose3, measured_normalized, mask=None, rank_tol=1e-9):
    """Linear DLT from normalized (calibrated) measurements.

    poses: Pose3 with leaves [M, ...]; measured_normalized: [M, 2] (x/z, y/z
    in each camera frame); mask: [M] bool of valid views.

    Each view contributes two rows of A p_h = 0 built from the projection
    matrix P = [R^T | -R^T t] (world->cam). Solved by SVD of the 4-col A
    (triangulation.h:88, triangulateDLT). Returns (point [3], smallest
    singular value) — the caller thresholds rank_tol.
    """
    M = measured_normalized.shape[0]
    dtype = measured_normalized.dtype
    if mask is None:
        mask = jnp.ones((M,), dtype=bool)
    Rt = jnp.swapaxes(poses.R, -1, -2)  # [M,3,3] world->cam rotation
    tc = -jnp.einsum("mij,mj->mi", Rt, poses.t)  # [M,3]
    P = jnp.concatenate([Rt, tc[..., None]], axis=-1)  # [M,3,4]
    x = measured_normalized[:, 0]
    y = measured_normalized[:, 1]
    rows1 = x[:, None] * P[:, 2, :] - P[:, 0, :]  # [M,4]
    rows2 = y[:, None] * P[:, 2, :] - P[:, 1, :]
    A = jnp.concatenate([rows1, rows2], axis=0)  # [2M,4]
    w = jnp.concatenate([mask, mask]).astype(dtype)[:, None]
    A = A * w
    # smallest right singular vector of A via eigh of A^T A (4x4 — tiny).
    # The null vector IS the solution; rank adequacy = the remaining three
    # singular values exceed rank_tol (reference DLT rank check,
    # base/Matrix.cpp DLT + triangulation.cpp: rank<3 -> degenerate).
    AtA = A.T @ A
    evals, evecs = jnp.linalg.eigh(AtA)
    v = evecs[:, 0]
    sv_second = jnp.sqrt(jnp.maximum(evals[1], 0.0))
    wh = jnp.where(jnp.abs(v[3]) < 1e-12, 1e-12, v[3])
    return v[:3] / wh, sv_second


def triangulate_lost(poses: Pose3, measured_normalized, mask=None, sigma_noise=1e-3):
    """LOST triangulation (Henry & Christian 2022; triangulation.h:111).

    Statistically optimal linear triangulation: each view contributes rows
    q_i = (1/sigma d_i) * [u_i]_x (p - t_i) = 0 where u_i is the world-frame
    bearing and d_i an estimated distance weighting. Solved as a 3x3 normal
    system — no SVD, ideal for batching.
    """
    M = measured_normalized.shape[0]
    dtype = measured_normalized.dtype
    if mask is None:
        mask = jnp.ones((M,), dtype=bool)
    ones = jnp.ones((M, 1), dtype=dtype)
    bearings_cam = jnp.concatenate([measured_normalized, ones], axis=-1)
    bearings_cam = bearings_cam / jnp.linalg.norm(bearings_cam, axis=-1, keepdims=True)
    u = jnp.einsum("mij,mj->mi", poses.R, bearings_cam)  # world bearings [M,3]
    t = poses.t  # camera centers [M,3]

    # distance estimate per view from the best-conditioned pair: use the
    # DLT point to compute d_i = ||p0 - t_i|| (one cheap pre-pass).
    p0, _ = triangulate_dlt(poses, measured_normalized, mask)
    d = jnp.linalg.norm(p0[None, :] - t, axis=-1)
    w = (mask.astype(dtype) / jnp.maximum(sigma_noise * d, 1e-12))[:, None, None]

    ux = so3.hat(u)  # [M,3,3]
    A = w * ux  # [M,3,3] stacked cross operators
    b = jnp.einsum("mij,mj->mi", A, t)  # [M,3]
    AtA = jnp.einsum("mij,mik->jk", A, A)
    Atb = jnp.einsum("mij,mi->j", A, b)
    eye = jnp.eye(3, dtype=dtype)
    p = jnp.linalg.solve(AtA + 1e-12 * eye, Atb)
    return p


def triangulate_nonlinear(
    poses: Pose3, measured_normalized, point_init, mask=None, iterations: int = 5
):
    """Tiny GN refinement on the reprojection residuals (triangulation.h:191).

    Fixed iteration count (lax.fori_loop-able); each step solves a 3x3 system.
    """
    M = measured_normalized.shape[0]
    dtype = measured_normalized.dtype
    if mask is None:
        mask = jnp.ones((M,), dtype=bool)
    mf = mask.astype(dtype)

    def residual(p):
        q = pose3.transform_to(poses, p[None, :].repeat(M, 0))
        z = jnp.where(jnp.abs(q[..., 2]) < 1e-9, 1e-9, q[..., 2])
        r = q[..., :2] / z[..., None] - measured_normalized
        return (r * mf[:, None]).reshape(-1)

    def body(_, p):
        J = jax.jacfwd(residual)(p)  # [2M,3]
        r = residual(p)
        H = J.T @ J + 1e-9 * jnp.eye(3, dtype=dtype)
        return p - jnp.linalg.solve(H, J.T @ r)

    return jax.lax.fori_loop(0, iterations, body, point_init)


def triangulate_point3(
    poses: Pose3,
    measured_normalized,
    mask=None,
    rank_tol: float = 1e-9,
    optimize: bool = False,
    use_lost: bool = False,
):
    """Front-door triangulation (triangulation.h:425 triangulatePoint3).

    Returns (point [3], rank_ok bool). Cheirality is the caller's check
    (triangulate_safe)."""
    if use_lost:
        p = triangulate_lost(poses, measured_normalized, mask)
        ok = jnp.asarray(True)
    else:
        p, sv = triangulate_dlt(poses, measured_normalized, mask, rank_tol)
        ok = sv >= rank_tol
    if optimize:
        p = triangulate_nonlinear(poses, measured_normalized, p, mask)
    return p, ok


def triangulate_safe(
    poses: Pose3,
    measured_normalized,
    mask=None,
    params: Optional[TriangulationParameters] = None,
    optimize: bool = True,
) -> TriangulationResult:
    """triangulateSafe (triangulation.h:644): status-coded triangulation.

    Checks, in the reference's order: enough views (>=2) else DEGENERATE;
    cheirality (all depths > 0) else BEHIND_CAMERA; landmark distance
    threshold else FAR_POINT; max reprojection error else OUTLIER.
    Fully jit-safe: returns masked codes, never raises.
    """
    params = params or TriangulationParameters()
    M = measured_normalized.shape[0]
    dtype = measured_normalized.dtype
    if mask is None:
        mask = jnp.ones((M,), dtype=bool)
    n_views = jnp.sum(mask.astype(jnp.int32))

    p, rank_ok = triangulate_point3(
        poses, measured_normalized, mask, rank_tol=params.rank_tolerance,
        optimize=optimize,
    )

    q = pose3.transform_to(poses, jnp.broadcast_to(p, (M, 3)))
    depths = q[..., 2]
    cheiral_ok = jnp.all(jnp.where(mask, depths > 0, True))

    dists = jnp.linalg.norm(p[None, :] - poses.t, axis=-1)
    far = jnp.logical_and(
        params.landmark_distance_threshold > 0,
        jnp.any(jnp.where(mask, dists > params.landmark_distance_threshold, False)),
    )

    zs = jnp.where(jnp.abs(depths) < 1e-9, 1e-9, depths)
    reproj = q[..., :2] / zs[..., None] - measured_normalized
    maxerr = jnp.max(jnp.where(mask, jnp.linalg.norm(reproj, axis=-1), 0.0))
    outlier = jnp.logical_and(
        params.dynamic_outlier_rejection_threshold > 0,
        maxerr > params.dynamic_outlier_rejection_threshold,
    )

    status = jnp.where(
        jnp.logical_or(n_views < 2, ~rank_ok),
        DEGENERATE,
        jnp.where(
            ~cheiral_ok,
            BEHIND_CAMERA,
            jnp.where(far, FAR_POINT, jnp.where(outlier, OUTLIER, VALID)),
        ),
    ).astype(jnp.int32)
    return TriangulationResult(p, status)


def triangulate_batch(
    poses_per_track: Pose3,
    measured_normalized,
    mask,
    params: Optional[TriangulationParameters] = None,
    optimize: bool = True,
) -> TriangulationResult:
    """vmapped triangulate_safe over T tracks.

    poses_per_track: Pose3 leaves [T, M, ...]; measured [T, M, 2]; mask [T, M].
    """
    fn = lambda po, me, ma: triangulate_safe(po, me, ma, params, optimize)
    return jax.vmap(fn)(poses_per_track, measured_normalized, mask)
