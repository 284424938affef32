"""BAL (Bundle Adjustment in the Large) dataset I/O + the SfmCamera manifold.

Mirrors gtsam/sfm/SfmData.{h,cpp}:
  - observations stored per track with v NEGATED (SfmData.cpp:209)
  - camera rotations are BAL/OpenGL Rodrigues vectors, converted to
    camera-to-world gtsam poses via openGL2gtsam (SfmData.cpp:79-85):
    wRc = R^T * diag(1,-1,-1), wtc = R^T * (-t)  [wait: R.unrotate(-t)]
  - calibration Cal3Bundler (f, k1, k2)

SfmCamera = PinholeCamera<Cal3Bundler>: a 9-dim product manifold
(pose expmap chart on the first 6 coords, vector calibration on the last 3),
matching the reference's camera manifold used by SFMExample_bal.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.geometry import pose3, so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3


class SfmCamera(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3] camera-to-world rotation
    t: jnp.ndarray  # [..., 3]    camera center in world
    cal: jnp.ndarray  # [..., 3]  Cal3Bundler (f, k1, k2)


def _sfm_retract(c: SfmCamera, xi) -> SfmCamera:
    p = pose3.retract(Pose3(c.R, c.t), xi[..., :6])
    return SfmCamera(p.R, p.t, c.cal + xi[..., 6:])


def _sfm_local(a: SfmCamera, b: SfmCamera):
    xi = pose3.local(Pose3(a.R, a.t), Pose3(b.R, b.t))
    return jnp.concatenate([xi, b.cal - a.cal], axis=-1)


def _sfm_identity(dtype=jnp.float32):
    return SfmCamera(
        jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), jnp.zeros(3, dtype=dtype)
    )


SFM_CAMERA = manifold.register(
    manifold.ManifoldType(
        name="SfmCamera",
        dim=9,
        retract=_sfm_retract,
        local=_sfm_local,
        identity=_sfm_identity,
    )
)


class SfmTrack(NamedTuple):
    point: np.ndarray  # [3]
    cam_idx: np.ndarray  # [M] camera indices
    uv: np.ndarray  # [M, 2] measurements (v negated per reference)


class SfmData(NamedTuple):
    cameras: List[SfmCamera]
    tracks: List[SfmTrack]

    @property
    def n_cameras(self):
        return len(self.cameras)

    @property
    def n_tracks(self):
        return len(self.tracks)


def _np_rodrigues(w: np.ndarray) -> np.ndarray:
    """Pure-numpy SO(3) exp (host-side; avoids per-camera device ops)."""
    th = np.linalg.norm(w)
    if th < 1e-12:
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        return np.eye(3) + K
    a = w / th
    K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def _opengl_to_gtsam(w: np.ndarray, t: np.ndarray, dtype):
    """openGL2gtsam (SfmData.cpp:79-85)."""
    R = _np_rodrigues(np.asarray(w, dtype=np.float64))
    R90 = np.diag([1.0, -1.0, -1.0])
    wRc = R.T @ R90
    wtc = R.T @ (-t)
    return wRc.astype(dtype), wtc.astype(dtype)


def _read_bal_native(path: str):
    """C++ BAL tokenizer (native/src/io_native.cpp bal_parse); None if the
    native library is unavailable."""
    try:
        from gtsam_petercdev_tpu.native import load_library
    except Exception:
        return None
    lib = load_library()
    if lib is None:
        return None
    import ctypes

    h = lib.bal_parse(path.encode())
    if not h:
        return None
    try:
        counts = np.zeros(3, dtype=np.int64)
        lib.bal_counts(h, counts.ctypes.data_as(ctypes.c_void_p))
        n_cams, n_pts, n_obs = (int(c) for c in counts)
        cam_idx = np.zeros(n_obs, dtype=np.int64)
        pt_idx = np.zeros(n_obs, dtype=np.int64)
        uv = np.zeros((n_obs, 2))
        cameras = np.zeros((n_cams, 9))
        points = np.zeros((n_pts, 3))
        lib.bal_get(
            h,
            cam_idx.ctypes.data_as(ctypes.c_void_p),
            pt_idx.ctypes.data_as(ctypes.c_void_p),
            uv.ctypes.data_as(ctypes.c_void_p),
            cameras.ctypes.data_as(ctypes.c_void_p),
            points.ctypes.data_as(ctypes.c_void_p),
        )
        return n_cams, n_pts, n_obs, cam_idx, pt_idx, uv, cameras, points
    finally:
        lib.bal_free(h)


def read_bal(path: str, dtype=np.float64) -> SfmData:
    """SfmData::FromBalFile (SfmData.cpp:189)."""
    # canonicalize (f64 -> f32 when x64 is disabled) so device conversion
    # below is explicit rather than a silent-truncation warning
    dtype = jax.dtypes.canonicalize_dtype(jnp.dtype(dtype))
    native = _read_bal_native(path)
    if native is not None:
        n_cams, n_pts, n_obs, cam_idx, pt_idx, uv, cams9, pts3 = native
        obs_cam = [[] for _ in range(n_pts)]
        obs_uv = [[] for _ in range(n_pts)]
        for k in range(n_obs):
            j = int(pt_idx[k])
            obs_cam[j].append(int(cam_idx[k]))
            obs_uv[j].append((uv[k, 0], -uv[k, 1]))  # negate v (SfmData.cpp:209)
        cameras = []
        for c in range(n_cams):
            R, cc = _opengl_to_gtsam(cams9[c, :3], cams9[c, 3:6], dtype)
            cameras.append(
                SfmCamera(
                    jnp.asarray(R, dtype=dtype),
                    jnp.asarray(cc, dtype=dtype),
                    jnp.asarray(cams9[c, 6:9], dtype=dtype),
                )
            )
        tracks = [
            SfmTrack(
                point=pts3[j].astype(dtype),
                cam_idx=np.asarray(obs_cam[j], dtype=np.int64),
                uv=np.asarray(obs_uv[j], dtype=dtype),
            )
            for j in range(n_pts)
        ]
        return SfmData(cameras=cameras, tracks=tracks)

    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)

    def nxt():
        return next(it)

    n_cams, n_pts, n_obs = int(nxt()), int(nxt()), int(nxt())
    obs_cam = [[] for _ in range(n_pts)]
    obs_uv = [[] for _ in range(n_pts)]
    for _ in range(n_obs):
        i, j = int(nxt()), int(nxt())
        u, v = float(nxt()), float(nxt())
        obs_cam[j].append(i)
        obs_uv[j].append((u, -v))  # negate v (SfmData.cpp:209)

    cameras = []
    for _ in range(n_cams):
        w = np.array([float(nxt()), float(nxt()), float(nxt())])
        t = np.array([float(nxt()), float(nxt()), float(nxt())])
        f_, k1, k2 = float(nxt()), float(nxt()), float(nxt())
        R, c = _opengl_to_gtsam(w, t, dtype)
        cameras.append(
            SfmCamera(
                jnp.asarray(R, dtype=dtype),
                jnp.asarray(c, dtype=dtype),
                jnp.asarray([f_, k1, k2], dtype=dtype),
            )
        )

    tracks = []
    for j in range(n_pts):
        p = np.array([float(nxt()), float(nxt()), float(nxt())], dtype=dtype)
        tracks.append(
            SfmTrack(
                point=p,
                cam_idx=np.asarray(obs_cam[j], dtype=np.int64),
                uv=np.asarray(obs_uv[j], dtype=dtype),
            )
        )
    return SfmData(cameras=cameras, tracks=tracks)
