"""Smart projection factors: structureless bundle adjustment.

Reference: gtsam/slam/SmartFactorBase.h:51-309 (stacked F, E, b per track),
SmartProjectionFactor.h:44-332 (on-demand triangulateSafe + linearize),
geometry/CameraSet.h:175-241 (SchurComplement building the m*6+1 reduced
camera Hessian per landmark).

TPU-native design: ALL tracks share one fixed max-views M with a validity
mask, so triangulation, Jacobians, and the per-track Schur complement are one
`vmap` each. Degenerate / behind-camera / outlier tracks are zero-weighted
(the jit-safe analog of the reference's degeneracy modes,
SmartProjectionFactor.h:128-196) rather than raising.

The linearized output is the reduced camera system contribution:
  H_cc[(a,b)] += delta_ab F_a^T F_a - W_a P W_b^T      (per track, per view pair)
  g_c[a]     += F_a^T b_a - W_a P (sum_m E_m^T b_m)
which `smart_levenberg_marquardt` scatter-adds into the dense camera Hessian
alongside any regular camera-only factors (priors, between factors).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import cal3, cameras, pose3, triangulation
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass(frozen=True)
class SmartProjectionParams:
    """slam/SmartFactorParams.h (linearization mode fixed to HESSIAN —
    the Schur-complement mode; IMPLICIT_SCHUR is served by the matrix-free
    `hvp` path)."""

    triangulation: triangulation.TriangulationParameters = (
        triangulation.TriangulationParameters()
    )
    retriangulate: bool = True
    sigma: float = 1.0  # isotropic pixel noise


@dataclass
class SmartProjectionFactorBatch:
    """T tracks, each observed by up to M cameras (masked).

    cam_rows: [T, M] int32 rows into the camera type batch
    mask:     [T, M] bool — view validity
    measured: [T, M, 2] pixel measurements
    cal:      calibration bank [C, 5] (Cal3_S2 rows); C == 1 is the shared
              single-camera case, C > 1 the multi-camera RIG
              (slam/SmartProjectionRigFactor.h:49 — fixed per-camera K)
    cal_rows: [T, M] int32 row of `cal` used by each view (all-zero default)
    """

    cam_rows: np.ndarray
    mask: np.ndarray
    measured: jnp.ndarray
    cal: jnp.ndarray
    params: SmartProjectionParams = field(default_factory=SmartProjectionParams)
    cal_rows: Optional[np.ndarray] = None
    # stereo smart factor (gtsam_unstable/slam/SmartStereoProjectionFactor.h:55):
    # measured [T, M, 3] = (uL, uR, v), cal rows [C, 6] = Cal3_S2Stereo
    # (fx fy s u0 v0 baseline); the same Schur/implicit machinery applies
    # with residual dim 3
    stereo: bool = False

    def __post_init__(self):
        if np.asarray(self.cal).ndim == 1:
            self.cal = jnp.asarray(self.cal)[None, :]
        if self.cal_rows is None:
            self.cal_rows = np.zeros(self.cam_rows.shape, dtype=np.int32)

    @property
    def n_tracks(self) -> int:
        return self.cam_rows.shape[0]

    @property
    def max_views(self) -> int:
        return self.cam_rows.shape[1]


def from_tracks(
    tracks: List[List[Tuple[int, np.ndarray]]],
    cal,
    params: Optional[SmartProjectionParams] = None,
    dtype=jnp.float64,
    cal_of_cam=None,
    stereo: bool = False,
) -> SmartProjectionFactorBatch:
    """Build a batch from per-track (camera_row, uv) observation lists.

    cal_of_cam: optional {camera_row: cal_row} for rig configurations.
    stereo=True: observations are (uL, uR, v) and cal rows are
    Cal3_S2Stereo [fx fy s u0 v0 b] (SmartStereoProjectionFactor)."""
    T = len(tracks)
    M = max(len(t) for t in tracks)
    zdim = 3 if stereo else 2
    cam_rows = np.zeros((T, M), dtype=np.int32)
    mask = np.zeros((T, M), dtype=bool)
    measured = np.zeros((T, M, zdim))
    cal_rows = np.zeros((T, M), dtype=np.int32)
    for j, t in enumerate(tracks):
        for m, (ci, uv) in enumerate(t):
            cam_rows[j, m] = ci
            mask[j, m] = True
            measured[j, m] = np.asarray(uv)
            if cal_of_cam is not None:
                cal_rows[j, m] = cal_of_cam[ci]
    return SmartProjectionFactorBatch(
        cam_rows,
        mask,
        jnp.asarray(measured, dtype=dtype),
        jnp.asarray(cal, dtype=dtype),
        params or SmartProjectionParams(),
        cal_rows,
        stereo=stereo,
    )


def _track_terms(batch: SmartProjectionFactorBatch, poses: Pose3):
    """Per-track triangulation + whitened F, E, b stacks (vmapped).

    poses: gathered Pose3 leaves [T, M, ...].
    Returns (F [T,M,2,6], E [T,M,2,3], b [T,M,2], valid [T]).
    """
    sigma = batch.params.sigma
    tri_params = batch.params.triangulation
    cals = batch.cal[jnp.asarray(batch.cal_rows)]  # [T, M, 5|6] per-view K
    stereo = batch.stereo

    def one_track(pose_t: Pose3, uv, m, cal_t):
        # triangulate from the left-camera rays (stereo: uL, v)
        uv_mono = jnp.stack([uv[:, 0], uv[:, -1]], axis=1) if stereo else uv
        pn_meas = jax.vmap(cal3.cal3_s2_calibrate)(cal_t[:, :5], uv_mono)
        res = triangulation.triangulate_safe(
            pose_t, pn_meas, m, tri_params, optimize=True
        )
        p = res.point
        valid = res.status == triangulation.VALID

        if stereo:

            def view_resid(xi, pose_1: Pose3, point, cal_1):
                pr = pose3.retract(pose_1, xi)
                z3, _ = cameras.stereo_project(pr, point, cal_1)
                return z3

        else:

            def view_resid(xi, pose_1: Pose3, point, cal_1):
                pr = pose3.retract(pose_1, xi)
                q = pose3.transform_to(pr, point)
                z = jnp.where(jnp.abs(q[2]) < 1e-9, 1e-9, q[2])
                return q[:2] / z

        def one_view(pose_1: Pose3, uv_1, cal_1):
            z6 = jnp.zeros((6,), dtype=uv.dtype)
            pn = view_resid(z6, pose_1, p, cal_1)
            F1 = jax.jacfwd(view_resid, argnums=0)(z6, pose_1, p, cal_1)
            E1 = jax.jacfwd(lambda pt: view_resid(z6, pose_1, pt, cal_1))(p)
            if stereo:
                b1 = uv_1 - pn  # pixel-space residual
                f_eff = jnp.ones((), dtype=uv.dtype)
            else:
                b1 = cal3.cal3_s2_calibrate(cal_1, uv_1) - pn
                # whiten per view: normalized-coord noise = sigma / focal
                f_eff = 0.5 * (cal_1[0] + cal_1[1])
            return F1, E1, b1, f_eff

        F, E, b, f_eff = jax.vmap(one_view)(pose_t, uv, cal_t)
        w = (f_eff[:, None] / sigma) * m.astype(uv.dtype)[:, None]
        F = F * w[..., None]
        E = E * w[..., None]
        b = b * w
        return F, E, b, valid

    return jax.vmap(one_track)(
        poses, batch.measured, jnp.asarray(batch.mask), cals
    )


def schur_contributions(batch: SmartProjectionFactorBatch, poses: Pose3, lam=0.0):
    """Reduced camera-system pieces per track (CameraSet::SchurComplement).

    Returns (Hblocks [T,M,M,6,6], gblocks [T,M,6], total_err scalar).
    Invalid tracks contribute zero.
    """
    F, E, b, valid = _track_terms(batch, poses)
    dtype = b.dtype
    vw = valid.astype(dtype)[:, None, None]

    Hpp = jnp.einsum("tmdi,tmdj->tij", E, E)  # [T,3,3]
    eye3 = jnp.eye(3, dtype=dtype)
    P = jnp.linalg.inv(Hpp + (1e-9 + lam) * eye3)  # point covariance [T,3,3]
    W = jnp.einsum("tmdi,tmdj->tmij", F, E)  # [T,M,6,3]
    gp = jnp.einsum("tmdi,tmd->ti", E, b)  # [T,3]

    Fb = jnp.einsum("tmdi,tmd->tmi", F, b)  # [T,M,6]
    WPgp = jnp.einsum("tmij,tjk,tk->tmi", W, P, gp)
    gblocks = (Fb - WPgp) * vw  # [T,M,6]

    FtF = jnp.einsum("tmdi,tmdj->tmij", F, F)  # diag blocks [T,M,6,6]
    WPWt = jnp.einsum("taij,tjk,tblk->tabil", W, P, W)  # [T,M,M,6,6]
    M_ = batch.max_views
    diag = jnp.einsum("ab,taij->tabij", jnp.eye(M_, dtype=dtype), FtF)
    Hblocks = (diag - WPWt) * vw[..., None, None]

    err = 0.5 * jnp.sum((b * valid.astype(dtype)[:, None, None]) ** 2)
    return Hblocks, gblocks, err


def total_error(batch: SmartProjectionFactorBatch, poses: Pose3) -> jnp.ndarray:
    """Sum of whitened reprojection errors at the triangulated points
    (SmartProjectionFactor::totalReprojectionError)."""
    _, _, b, valid = _track_terms(batch, poses)
    return 0.5 * jnp.sum((b * valid.astype(b.dtype)[:, None, None]) ** 2)


def assemble_camera_system(
    batch: SmartProjectionFactorBatch,
    poses: Pose3,
    n_cams: int,
    lam=0.0,
):
    """Scatter track contributions into the dense camera (H, g)."""
    Hb, gb, err = schur_contributions(batch, poses, 0.0)
    dtype = gb.dtype
    D = n_cams * 6
    H = jnp.zeros((D, D), dtype=dtype)
    g = jnp.zeros((D,), dtype=dtype)
    rows = jnp.asarray(batch.cam_rows, dtype=jnp.int32)
    gidx = rows[..., None] * 6 + jnp.arange(6, dtype=jnp.int32)  # [T,M,6]
    g = g.at[gidx].add(gb)
    ga = gidx[:, :, None, :, None]  # [T,M,1,6,1]
    gb2 = gidx[:, None, :, None, :]  # [T,1,M,1,6]
    H = H.at[
        jnp.broadcast_to(ga, Hb.shape), jnp.broadcast_to(gb2, Hb.shape)
    ].add(Hb)
    return H, g, err


# ---------------------------------------------------------------------------
# IMPLICIT_SCHUR: matrix-free reduced-camera operator
# ---------------------------------------------------------------------------


def implicit_schur_terms(batch: SmartProjectionFactorBatch, poses: Pose3, lam=0.0):
    """Precompute the per-track pieces the implicit operator needs.

    Mirrors RegularImplicitSchurFactor.h:39 — the reduced camera Hessian
    H = F^T F - W P W^T is never formed; matvecs stream through the
    factored pieces (O(T M) memory instead of O(T M^2))."""
    F, E, b, valid = _track_terms(batch, poses)
    dtype = b.dtype
    Hpp = jnp.einsum("tmdi,tmdj->tij", E, E)
    P = jnp.linalg.inv(Hpp + (1e-9 + lam) * jnp.eye(3, dtype=dtype))
    vw = valid.astype(dtype)
    return dict(F=F, E=E, b=b, P=P, vw=vw)


def implicit_schur_hvp(terms, cam_rows, v6, n_cams: int):
    """y += (F^T F - W P W^T) v, matrix-free (multiplyHessianAdd analog,
    RegularImplicitSchurFactor.h:231). v6: [n_cams, 6]."""
    F, E, P, vw = terms["F"], terms["E"], terms["P"], terms["vw"]
    rows = jnp.asarray(cam_rows)
    vt = v6[rows]  # [T, M, 6]
    Fv = jnp.einsum("tmdi,tmi->tmd", F, vt)  # [T, M, 2]
    # point back-substitution: e = P E^T (F v)
    EtFv = jnp.einsum("tmdi,tmd->ti", E, Fv)
    e = jnp.einsum("tij,tj->ti", P, EtFv)
    # y = F^T (F v - E e)
    r = Fv - jnp.einsum("tmdi,ti->tmd", E, e)
    yt = jnp.einsum("tmdi,tmd->tmi", F, r) * vw[:, None, None]
    y = jnp.zeros((n_cams, 6), dtype=v6.dtype)
    return y.at[rows].add(yt)


def implicit_schur_gradient(terms, cam_rows, n_cams: int):
    """g = F^T b - W P E^T b (the reduced-system RHS)."""
    F, E, b, P, vw = (
        terms["F"], terms["E"], terms["b"], terms["P"], terms["vw"]
    )
    Etb = jnp.einsum("tmdi,tmd->ti", E, b)
    e = jnp.einsum("tij,tj->ti", P, Etb)
    r = b - jnp.einsum("tmdi,ti->tmd", E, e)
    gt = jnp.einsum("tmdi,tmd->tmi", F, r) * vw[:, None, None]
    g = jnp.zeros((n_cams, 6), dtype=b.dtype)
    return g.at[jnp.asarray(cam_rows)].add(gt)


def implicit_schur_block_diag(terms, cam_rows, n_cams: int):
    """Per-camera 6x6 diagonal blocks of the reduced Hessian (the
    block-Jacobi preconditioner; hessianDiagonal analog)."""
    F, E, P, vw = terms["F"], terms["E"], terms["P"], terms["vw"]
    FtF = jnp.einsum("tmdi,tmdj->tmij", F, F)
    W = jnp.einsum("tmdi,tmdj->tmij", F, E)  # [T, M, 6, 3]
    WPWt = jnp.einsum("tmij,tjk,tmlk->tmil", W, P, W)
    blocks = (FtF - WPWt) * vw[:, None, None, None]
    out = jnp.zeros((n_cams, 6, 6), dtype=blocks.dtype)
    return out.at[jnp.asarray(cam_rows)].add(blocks)


def smart_pcg(
    batch: SmartProjectionFactorBatch,
    poses: Pose3,
    n_cams: int,
    lam=0.0,
    tol: float = 1e-10,
    max_iters: int = 200,
):
    """Matrix-free PCG on the implicit Schur system (the IMPLICIT_SCHUR
    linearization mode plugged into iterative solving — the pipeline the
    reference reaches via RegularImplicitSchurFactor + PCGSolver).

    Returns delta [n_cams, 6]."""
    terms = implicit_schur_terms(batch, poses, 0.0)
    g = implicit_schur_gradient(terms, batch.cam_rows, n_cams)
    blocks = implicit_schur_block_diag(terms, batch.cam_rows, n_cams)
    dtype = g.dtype
    lam = jnp.asarray(lam, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    pre = blocks + (lam + 1e-9) * eye6
    Minv = jnp.linalg.inv(pre)

    def A(v):
        return implicit_schur_hvp(terms, batch.cam_rows, v, n_cams) + lam * v

    def apply_Minv(r):
        return jnp.einsum("nij,nj->ni", Minv, r)

    def dot(a, b):
        return jnp.vdot(a, b)

    x = jnp.zeros_like(g)
    r = g
    z = apply_Minv(r)
    p = z
    rz = dot(r, z)
    g2 = dot(g, g)

    def cond(st):
        x, r, p, rz, it = st
        return jnp.logical_and(it < max_iters, dot(r, r) > tol * tol * g2)

    def body(st):
        x, r, p, rz, it = st
        Ap = A(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_Minv(r)
        rz2 = dot(r, z)
        p = z + (rz2 / jnp.maximum(rz, 1e-30)) * p
        return (x, r, p, rz2, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(cond, body, (x, r, p, rz, jnp.array(0)))
    return x


# ---------------------------------------------------------------------------
# JACOBIAN_Q / JACOBIAN_SVD linearization modes
# ---------------------------------------------------------------------------


def jacobian_q_factors(batch: SmartProjectionFactorBatch, poses: Pose3):
    """JACOBIAN_Q mode (SmartFactorBase.h createJacobianQFactor /
    JacobianFactorQ.h): project the stacked view system through
    Q = I - E P E^T so the landmark drops out; returns the projected
    (A [T, M*2, M, 6], b [T, M*2]) whitened stacks (A is block-sparse over
    views; the dense [M*2, M*6] form is A.reshape(T, M*2, M*6)).

    Q is idempotent and PSD; Q^T Q = Q so using Q-projected rows as a plain
    Jacobian factor reproduces the Schur-complement Hessian exactly."""
    F, E, b, valid = _track_terms(batch, poses)
    T, M = F.shape[0], F.shape[1]
    dtype = b.dtype
    Hpp = jnp.einsum("tmdi,tmdj->tij", E, E)
    P = jnp.linalg.inv(Hpp + 1e-9 * jnp.eye(3, dtype=dtype))
    vw = valid.astype(dtype)

    # rows indexed by (view m, coord d) pairs: flatten to r = m*2+d
    Ef = E.reshape(T, M * 2, 3)
    Q = jnp.eye(M * 2, dtype=dtype)[None] - jnp.einsum(
        "tri,tij,tsj->trs", Ef, P, Ef
    )
    bf = b.reshape(T, M * 2)
    Fblock = _view_block_expand(F)  # [T, 2M, M, 6] block-sparse stack
    A = jnp.einsum("trs,tsmk->trmk", Q, Fblock)
    bq = jnp.einsum("trs,ts->tr", Q, bf)
    A = A * vw[:, None, None, None]
    bq = bq * vw[:, None]
    return A, bq


def _view_block_expand(F):
    """[T, M, 2, 6] -> [T, M*2, M, 6] with view-block structure (row r of
    view m occupies block column m only)."""
    T, M = F.shape[0], F.shape[1]
    dtype = F.dtype
    eye = jnp.eye(M, dtype=dtype)  # [M, M]
    # out[t, m, d, m2, k] = F[t, m, d, k] * eye[m, m2]
    out = jnp.einsum("tmdk,mn->tmdnk", F, eye)
    return out.reshape(T, M * 2, M, 6)


def jacobian_svd_factors(batch: SmartProjectionFactorBatch, poses: Pose3):
    """JACOBIAN_SVD mode (JacobianFactorSVD.h): explicit rank-(2M-3) basis
    of null(E^T) via eigendecomposition of the projector Q (all eigenvalues
    are 0 or 1); returns (A [T, 2M-3, M, 6], b [T, 2M-3]) — the same
    information as JACOBIAN_Q in minimal row count."""
    F, E, b, valid = _track_terms(batch, poses)
    T, M = F.shape[0], F.shape[1]
    dtype = b.dtype
    Hpp = jnp.einsum("tmdi,tmdj->tij", E, E)
    P = jnp.linalg.inv(Hpp + 1e-9 * jnp.eye(3, dtype=dtype))
    Ef = E.reshape(T, M * 2, 3)
    Q = jnp.eye(M * 2, dtype=dtype)[None] - jnp.einsum(
        "tri,tij,tsj->trs", Ef, P, Ef
    )
    # eigh: Q = V diag(w) V^T with w in {0, 1}; basis = top 2M-3 eigenvectors
    w, V = jnp.linalg.eigh(Q)
    k = M * 2 - 3
    basis = V[:, :, -k:]  # [T, 2M, k] (ascending eigenvalues)
    bf = b.reshape(T, M * 2)
    Ab = jnp.einsum("trk,trs->tks", basis, _view_block_expand(F).reshape(T, M * 2, M * 6))
    A = Ab.reshape(T, k, M, 6)
    bs = jnp.einsum("trk,tr->tk", basis, bf)
    vw = valid.astype(dtype)
    return A * vw[:, None, None, None], bs * vw[:, None]


def smart_levenberg_marquardt(
    graph: NonlinearFactorGraph,
    smart: SmartProjectionFactorBatch,
    values: Values,
    params: Optional[optimizers.LMParams] = None,
    cam_type: str = "Pose3",
) -> optimizers.OptimizerResult:
    """LM over camera poses only: regular factors + smart-factor Schur system.

    Mirrors the SFMExample_SmartFactor pipeline (SURVEY §3.2 smart variant).
    """
    params = params or optimizers.LMParams()
    graph._materialize()
    n_cams = jax.tree_util.tree_leaves(values.params(cam_type))[0].shape[0]

    @jax.jit
    def err_fn(values_in: Values):
        poses = jax.tree_util.tree_map(
            lambda a: a[jnp.asarray(smart.cam_rows)], values_in.params(cam_type)
        )
        e = total_error(smart, poses)
        return e + graph.error(values_in)

    @jax.jit
    def assemble_fn(values_in: Values):
        poses = jax.tree_util.tree_map(
            lambda a: a[jnp.asarray(smart.cam_rows)], values_in.params(cam_type)
        )
        H, g, _ = assemble_camera_system(smart, poses, n_cams)
        if graph.batches:
            lg = graph.linearize(values_in)
            H2, g2 = linsolve.assemble_dense(lg)
            H = H + H2
            g = g + g2
        return H, g

    @jax.jit
    def solve_fn(H, g, lam):
        x = linsolve.dense_solve(H, g, lam, diagonal_damping=params.diagonal_damping)
        lin_dec = jnp.dot(g, x) - 0.5 * jnp.dot(x, H @ x)
        return x, lin_dec

    @jax.jit
    def retract_fn(values_in: Values, delta):
        return values_in.retract(delta)

    err = float(err_fn(values))
    history = [err]
    lam = params.lambda_initial
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        H, g = assemble_fn(values)
        accepted = False
        for _ in range(params.max_try_iterations):
            x, lin_dec = solve_fn(H, g, jnp.asarray(lam, dtype=H.dtype))
            delta = {cam_type: x.reshape(n_cams, 6)}
            new_values = retract_fn(values, delta)
            new_err = float(err_fn(new_values))
            rho = (err - new_err) / max(float(lin_dec), 1e-30)
            if err - new_err > 0 and rho >= params.min_model_fidelity:
                values = new_values
                lam = max(lam / params.lambda_factor, params.lambda_lower_bound)
                accepted = True
                break
            lam *= params.lambda_factor
            if lam > params.lambda_upper_bound:
                break
        if not accepted:
            converged = True
            break
        history.append(new_err)
        if optimizers.check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
    return optimizers.OptimizerResult(values, err, it, converged, history)
