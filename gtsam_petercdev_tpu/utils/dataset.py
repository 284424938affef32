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
    """3x3 -> (w,x,y,z) quaternion (host-side numpy)."""
    import jax.numpy as jnp

    return np.asarray(so3.to_quaternion(jnp.asarray(R)))


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

    import jax.numpy as jnp

    def q_to_R(q):
        return np.asarray(so3.from_quaternion(jnp.asarray(q)))

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


def _sym_from_upper(vals, d):
    """Fill symmetric dxd from upper-triangle row-major list."""
    M = np.zeros((d, d))
    idx = 0
    for i in range(d):
        for j in range(i, d):
            M[i, j] = M[j, i] = vals[idx]
            idx += 1
    return M


def read_g2o(
    path: str, is3D: bool = False, dtype=np.float64
) -> Tuple[NonlinearFactorGraph, Values]:
    """Parse a g2o file (reference readG2o, dataset.h:190)."""
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

    graph = NonlinearFactorGraph()
    values = Values()

    if is3D or vertices3 or edges3:
        if not vertices3 and edges3:
            # vertex-less TORO file (e.g. sphere2500): bootstrap the initial
            # trajectory by composing odometry, as the reference harnesses do.
            vertices3 = initialize_from_odometry(edges3)
        for i in sorted(vertices3.keys()):
            t, q = vertices3[i]
            R = np.asarray(so3.from_quaternion(jnp.asarray(q, dtype=dtype)))
            values.insert(i, "Pose3", Pose3(jnp.asarray(R, dtype=dtype),
                                            jnp.asarray(t, dtype=dtype)))
        if edges3:
            keys = np.array([[i, j] for (i, j, *_rest) in edges3], dtype=np.uint64)
            Rs = np.stack(
                [
                    np.asarray(so3.from_quaternion(jnp.asarray(q, dtype=dtype)))
                    for (_i, _j, _t, q, _info) in edges3
                ]
            )
            ts = np.stack([t for (_i, _j, t, _q, _info) in edges3])
            infos = np.stack([info for (*_r, info) in edges3])
            sqrt_infos = noise.gaussian_information(infos.astype(dtype))
            graph.add_batch(
                between_factor("Pose3"),
                keys,
                Pose3(jnp.asarray(Rs, dtype=dtype), jnp.asarray(ts, dtype=dtype)),
                sqrt_infos,
            )
    else:
        for i in sorted(vertices2.keys()):
            values.insert(i, "Pose2", jnp.asarray(vertices2[i], dtype=dtype))
        if edges2:
            keys = np.array([[i, j] for (i, j, _m, _info) in edges2], dtype=np.uint64)
            ms = np.stack([m for (_i, _j, m, _info) in edges2])
            infos = np.stack([info for (*_r, info) in edges2])
            sqrt_infos = noise.gaussian_information(infos.astype(dtype))
            graph.add_batch(
                between_factor("Pose2"),
                keys,
                jnp.asarray(ms, dtype=dtype),
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
