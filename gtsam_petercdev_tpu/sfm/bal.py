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


def _opengl_to_gtsam(w: np.ndarray, t: np.ndarray, dtype):
    """openGL2gtsam (SfmData.cpp:79-85)."""
    R = np.asarray(so3.expmap(jnp.asarray(w, dtype=np.float64)))
    R90 = np.diag([1.0, -1.0, -1.0])
    wRc = R.T @ R90
    wtc = R.T @ (-t)
    return wRc.astype(dtype), wtc.astype(dtype)


def read_bal(path: str, dtype=np.float64) -> SfmData:
    """SfmData::FromBalFile (SfmData.cpp:189)."""
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
