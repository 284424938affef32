"""Dataset I/O: g2o / TORO pose-graph files (reference: gtsam/slam/dataset.cpp).

readG2o parses VERTEX_SE2 / EDGE_SE2 (TORO: VERTEX2 / EDGE2) and
VERTEX_SE3:QUAT / EDGE_SE3:QUAT into a (NonlinearFactorGraph, Values) pair.

g2o conventions handled to match the reference:
  * SE2 edge information is the upper triangle of a 6-entry (x, y, theta)
    info matrix (dataset.cpp:269).
  * SE3 edge information is the upper triangle (21 entries) in g2o (t, R)
    order; GTSAM tangent order is (R, t), so blocks are swapped
    (dataset.cpp:850-856).
  * TORO EDGE2 stores (ixx ixy it ixy2... ) in the order
    v(0) v(1) v(5) v(2) v(4) v(3) per dataset.cpp parsing of EDGE2.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from gtsam_petercdev_tpu.geometry import so3
from gtsam_petercdev_tpu.geometry.pose3 import Pose3
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor

import jax.numpy as jnp


def _ypr_matrix(yaw, pitch, roll):
    """Rot3::Ypr(y,p,r) = Rz(y) Ry(p) Rx(r) as a numpy 3x3."""
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cr, sr = np.cos(roll), np.sin(roll)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def _mat_to_quat(R):
    """[...,3,3] -> (w,x,y,z) quaternion, pure numpy (Shepperd's method;
    mirrors so3.to_quaternion without issuing device ops — dataset parsing
    must stay host-only under remote-device backends)."""
    R = np.asarray(R, dtype=np.float64)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def ssqrt(x):
        return np.sqrt(np.maximum(x, 1e-12))

    q0 = np.stack(
        [ssqrt(1 + tr) / 2, (m21 - m12) / (2 * ssqrt(1 + tr)),
         (m02 - m20) / (2 * ssqrt(1 + tr)), (m10 - m01) / (2 * ssqrt(1 + tr))],
        axis=-1,
    )
    s1 = 2 * ssqrt(1 + m00 - m11 - m22)
    q1 = np.stack([(m21 - m12) / s1, s1 / 4, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = 2 * ssqrt(1 - m00 + m11 - m22)
    q2 = np.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2 / 4, (m12 + m21) / s2], axis=-1)
    s3 = 2 * ssqrt(1 - m00 - m11 + m22)
    q3 = np.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, s3 / 4], axis=-1)
    cand = np.stack([tr, m00, m11, m22], axis=-1)
    k = np.argmax(cand, axis=-1)
    qs = np.stack([q0, q1, q2, q3], axis=-2)
    q = np.take_along_axis(qs, np.repeat(k[..., None, None], 4, axis=-1), axis=-2)[..., 0, :]
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def initialize_from_odometry(edges3, first=None):
    """Compose sequential edges into an initial trajectory.

    edges3: list of (i, j, t, q_wxyz, info). Returns {id: (t, q_wxyz)}.
    Mirrors the incremental bootstrap used by the reference's
    SolverComparer/ISAM2 harnesses for vertex-less TORO files.
    """
    poses = {}
    if first is None:
        first = min(min(i, j) for (i, j, *_r) in edges3)
    poses[first] = (np.zeros(3), np.array([1.0, 0.0, 0.0, 0.0]))

    def q_to_R(q):
        return _np_quat_to_R(q)

    for (i, j, t, q, _info) in edges3:
        if i in poses and j not in poses:
            ti, qi = poses[i]
            Ri = q_to_R(qi)
            Rij = q_to_R(q)
            poses[j] = (ti + Ri @ t, _mat_to_quat(Ri @ Rij))
        elif j in poses and i not in poses:
            tj, qj = poses[j]
            Rj = q_to_R(qj)
            Rij = q_to_R(q)
            Ri = Rj @ Rij.T
            poses[i] = (tj - Ri @ t, _mat_to_quat(Ri))
    return poses


def _np_quat_to_R(q):
    """Vectorized host-side quaternion (w,x,y,z) [...,4] -> R [...,3,3].
    Matches so3.from_quaternion; pure numpy so dataset loading never issues
    per-item device ops (critical under the axon TPU tunnel where each eager
    op is a remote round trip)."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _sym_from_upper(vals, d):
    """Fill symmetric dxd from upper-triangle row-major list."""
    M = np.zeros((d, d))
    idx = 0
    for i in range(d):
        for j in range(i, d):
            M[i, j] = M[j, i] = vals[idx]
            idx += 1
    return M


def _parse_g2o_native(path: str):
    """Parse via the C++ io_native library (native/src/io_native.cpp).

    Returns the same (vertices2, vertices3, edges2, edges3) intermediate as
    the Python parser, or None when the native library is unavailable.
    """
    try:
        from gtsam_petercdev_tpu.native import load_library
    except Exception:
        return None
    lib = load_library()
    if lib is None:
        return None
    import ctypes

    h = lib.g2o_parse(path.encode())
    if not h:
        return None
    try:
        counts = np.zeros(4, dtype=np.int64)
        lib.g2o_counts(h, counts.ctypes.data_as(ctypes.c_void_p))
        nv2, nv3, ne2, ne3 = (int(c) for c in counts)

        vertices2, vertices3 = {}, {}
        edges2, edges3 = [], []
        if nv2:
            ids = np.zeros(nv2, dtype=np.int64)
            xyt = np.zeros((nv2, 3))
            lib.g2o_get_v2(h, ids.ctypes.data_as(ctypes.c_void_p),
                           xyt.ctypes.data_as(ctypes.c_void_p))
            vertices2 = {int(ids[k]): xyt[k] for k in range(nv2)}
        if nv3:
            ids = np.zeros(nv3, dtype=np.int64)
            t = np.zeros((nv3, 3))
            q = np.zeros((nv3, 4))
            lib.g2o_get_v3(h, ids.ctypes.data_as(ctypes.c_void_p),
                           t.ctypes.data_as(ctypes.c_void_p),
                           q.ctypes.data_as(ctypes.c_void_p))
            vertices3 = {int(ids[k]): (t[k], q[k]) for k in range(nv3)}
        if ne2:
            ij = np.zeros((ne2, 2), dtype=np.int64)
            m = np.zeros((ne2, 3))
            info = np.zeros((ne2, 3, 3))
            lib.g2o_get_e2(h, ij.ctypes.data_as(ctypes.c_void_p),
                           m.ctypes.data_as(ctypes.c_void_p),
                           info.ctypes.data_as(ctypes.c_void_p))
            edges2 = [(int(ij[k, 0]), int(ij[k, 1]), m[k], info[k]) for k in range(ne2)]
        if ne3:
            ij = np.zeros((ne3, 2), dtype=np.int64)
            t = np.zeros((ne3, 3))
            q = np.zeros((ne3, 4))
            info = np.zeros((ne3, 6, 6))
            kind = np.zeros(ne3, dtype=np.int32)
            lib.g2o_get_e3(h, ij.ctypes.data_as(ctypes.c_void_p),
                           t.ctypes.data_as(ctypes.c_void_p),
                           q.ctypes.data_as(ctypes.c_void_p),
                           info.ctypes.data_as(ctypes.c_void_p),
                           kind.ctypes.data_as(ctypes.c_void_p))
            # EDGE_SE3:QUAT info is in (t, R) file order: swap to (R, t)
            # blocks (dataset.cpp:850-856); EDGE3 is read as-is (parity).
            g2o_rows = kind == 0
            if g2o_rows.any():
                sw = info[g2o_rows]
                swapped = np.empty_like(sw)
                swapped[:, :3, :3] = sw[:, 3:, 3:]
                swapped[:, 3:, 3:] = sw[:, :3, :3]
                swapped[:, :3, 3:] = sw[:, 3:, :3]
                swapped[:, 3:, :3] = sw[:, :3, 3:]
                info[g2o_rows] = swapped
            edges3 = [
                (int(ij[k, 0]), int(ij[k, 1]), t[k], q[k], info[k])
                for k in range(ne3)
            ]
        return vertices2, vertices3, edges2, edges3
    finally:
        lib.g2o_free(h)


def read_g2o(
    path: str, is3D: bool = False, dtype=np.float64
) -> Tuple[NonlinearFactorGraph, Values]:
    """Parse a g2o file (reference readG2o, dataset.h:190).

    Uses the native C++ parser when available (10-30x faster on large
    datasets); falls back to the pure-Python line parser."""
    native = _parse_g2o_native(path)
    if native is not None:
        vertices2, vertices3, edges2, edges3 = native
        return _build_g2o_graph(vertices2, vertices3, edges2, edges3, is3D, dtype)
    vertices2, vertices3 = {}, {}
    edges2, edges3 = [], []

    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag in ("VERTEX_SE2", "VERTEX2"):
                i = int(parts[1])
                vertices2[i] = [float(p) for p in parts[2:5]]
            elif tag == "VERTEX_SE3:QUAT":
                i = int(parts[1])
                x, y, z, qx, qy, qz, qw = (float(p) for p in parts[2:9])
                vertices3[i] = (np.array([x, y, z]), np.array([qw, qx, qy, qz]))
            elif tag in ("EDGE_SE2", "EDGE2"):
                i, j = int(parts[1]), int(parts[2])
                vals = [float(p) for p in parts[3:]]
                dx, dy, dth = vals[0], vals[1], vals[2]
                iv = vals[3:]
                if tag == "EDGE_SE2":
                    info = _sym_from_upper(iv, 3)
                else:  # TORO EDGE2 ordering (dataset.cpp load2D TORO branch)
                    info = np.zeros((3, 3))
                    info[0, 0], info[0, 1], info[1, 1] = iv[0], iv[1], iv[2]
                    info[2, 2], info[0, 2], info[1, 2] = iv[3], iv[4], iv[5]
                    info[1, 0], info[2, 0], info[2, 1] = info[0, 1], info[0, 2], info[1, 2]
                edges2.append((i, j, np.array([dx, dy, dth]), info))
            elif tag == "VERTEX3":
                i = int(parts[1])
                x, y, z, roll, pitch, yaw = (float(p) for p in parts[2:8])
                R = _ypr_matrix(yaw, pitch, roll)
                vertices3[i] = (np.array([x, y, z]), _mat_to_quat(R))
            elif tag == "EDGE3":
                # TORO 3D: x y z roll pitch yaw + 21 upper-tri info entries.
                # The reference reads the info WITHOUT reordering — i.e. it is
                # interpreted directly in GTSAM (R, t) tangent order
                # (dataset.cpp:829-840) — replicated here for parity.
                i, j = int(parts[1]), int(parts[2])
                vals = [float(p) for p in parts[3:]]
                x, y, z, roll, pitch, yaw = vals[:6]
                R = _ypr_matrix(yaw, pitch, roll)
                info = _sym_from_upper(vals[6:27], 6)
                edges3.append(
                    (i, j, np.array([x, y, z]), _mat_to_quat(R), info)
                )
            elif tag == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                vals = [float(p) for p in parts[3:]]
                x, y, z, qx, qy, qz, qw = vals[:7]
                info_g2o = _sym_from_upper(vals[7:28], 6)
                # swap (t, R) -> (R, t) blocks (dataset.cpp:850-856)
                info = np.zeros((6, 6))
                info[:3, :3] = info_g2o[3:, 3:]
                info[3:, 3:] = info_g2o[:3, :3]
                info[:3, 3:] = info_g2o[3:, :3]
                info[3:, :3] = info_g2o[:3, 3:]
                edges3.append(
                    (i, j, np.array([x, y, z]), np.array([qw, qx, qy, qz]), info)
                )

    return _build_g2o_graph(vertices2, vertices3, edges2, edges3, is3D, dtype)


def _build_g2o_graph(vertices2, vertices3, edges2, edges3, is3D, dtype):
    graph = NonlinearFactorGraph()
    values = Values()

    if is3D or vertices3 or edges3:
        if not vertices3 and edges3:
            # vertex-less TORO file (e.g. sphere2500): bootstrap the initial
            # trajectory by composing odometry, as the reference harnesses do.
            vertices3 = initialize_from_odometry(edges3)
        vkeys = sorted(vertices3.keys())
        ts_v = np.stack([vertices3[i][0] for i in vkeys])
        Rs_v = _np_quat_to_R(np.stack([vertices3[i][1] for i in vkeys]))
        values.insert_batch(
            vkeys,
            "Pose3",
            Pose3(jnp.asarray(Rs_v, dtype=dtype), jnp.asarray(ts_v, dtype=dtype)),
        )
        if edges3:
            keys = np.array([[i, j] for (i, j, *_rest) in edges3], dtype=np.uint64)
            Rs = _np_quat_to_R(np.stack([q for (_i, _j, _t, q, _info) in edges3]))
            ts = np.stack([t for (_i, _j, t, _q, _info) in edges3])
            infos = np.stack([info for (*_r, info) in edges3])
            sqrt_infos = noise.gaussian_information(infos.astype(dtype))
            graph.add_batch(
                between_factor("Pose3"),
                keys,
                Pose3(Rs.astype(dtype), ts.astype(dtype)),
                sqrt_infos,
            )
    else:
        vkeys2 = sorted(vertices2.keys())
        if vkeys2:
            values.insert_batch(
                vkeys2,
                "Pose2",
                jnp.asarray(np.stack([vertices2[i] for i in vkeys2]), dtype=dtype),
            )
        if edges2:
            keys = np.array([[i, j] for (i, j, _m, _info) in edges2], dtype=np.uint64)
            ms = np.stack([m for (_i, _j, m, _info) in edges2])
            infos = np.stack([info for (*_r, info) in edges2])
            sqrt_infos = noise.gaussian_information(infos.astype(dtype))
            graph.add_batch(
                between_factor("Pose2"),
                keys,
                ms.astype(dtype),
                sqrt_infos,
            )

    return graph, values


def write_g2o(graph, values: Values, path: str):
    """Write Pose2/Pose3 values + Between factors (dataset.cpp writeG2o)."""
    lines = []
    for t in values.types():
        for key in values.type_keys(t):
            v = values.at(key)
            if t == "Pose2":
                v = np.asarray(v)
                lines.append(
                    f"VERTEX_SE2 {key} {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
                )
            elif t == "Pose3":
                tvec = np.asarray(v.t)
                q = np.asarray(so3.to_quaternion(v.R))  # (w,x,y,z)
                lines.append(
                    "VERTEX_SE3:QUAT "
                    f"{key} {tvec[0]:.6f} {tvec[1]:.6f} {tvec[2]:.6f} "
                    f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}"
                )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def find_example_data(name: str) -> str:
    """Path to a dataset shipped with the reference (findExampleDataFile)."""
    import os

    for root in ("/root/reference/examples/Data",):
        p = os.path.join(root, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)
