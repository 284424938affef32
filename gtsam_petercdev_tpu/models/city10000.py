"""City10000 incremental SLAM harness — the reference's headline iSAM2
benchmark (examples/ISAM2_City10000.cpp:60-160, examples/City10000.h:37-98).

Per dataset line `EDGE2 keyS _ keyT _ numMeas x y rad [...]`:
  * keyT == keyS+1: odometry — insert the new pose initialized from the
    current estimate of keyS composed with the measurement, add a
    BetweenFactor, and run one ISAM2 update.
  * otherwise: loop closure — add the BetweenFactor, run one update.

Reference semantics mirrored exactly (ISAM2_City10000.cpp:100-130,
City10000.h:30-35):
  * prior sigmas 1e-4; ODOMETRY sigmas (1/30, 1/30, 1/100);
  * LOOP-CLOSURE factors use sigmas (10, 10, 10) — the harness's
    non-ambiguity branch always takes the weak-noise model;
  * `max_loops` counts LOOP lines only (reference maxLoopCount, default
    2000 at ISAM2_City10000.cpp:49);
  * wildfire_threshold 0.0 = ISAM2GaussNewtonParams(0.0).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.geometry import pose2
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor


def parse_city10000(path: str, max_lines: Optional[int] = None):
    """-> list of (keyS, keyT, [measurements (x, y, theta)])."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0] != "EDGE2":
                continue
            keyS, keyT = int(parts[1]), int(parts[3])
            n_meas = int(parts[5])
            meas = [
                (
                    float(parts[6 + 3 * i]),
                    float(parts[7 + 3 * i]),
                    float(parts[8 + 3 * i]),
                )
                for i in range(n_meas)
            ]
            out.append((keyS, keyT, meas))
            if max_lines is not None and len(out) >= max_lines:
                break
    return out


@dataclass
class CityResult:
    estimate: np.ndarray  # [n_poses, 3]
    step_times: List[float] = field(default_factory=list)
    n_poses: int = 0
    n_loop_closures: int = 0
    total_time: float = 0.0

    def ate_rmse(self, gt: np.ndarray) -> float:
        n = min(self.n_poses, gt.shape[0])
        d = self.estimate[:n, :2] - gt[:n, :2]
        return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def run_city10000(
    path: str,
    max_steps: Optional[int] = None,
    max_loops: Optional[int] = None,
    wildfire_threshold: float = 0.0,
    relinearize_threshold: float = 0.01,
    relinearize_skip: int = 1,
    dtype=jnp.float64,
    progress_every: int = 0,
    partial_cb=None,  # called every progress interval with a CityResult
    checkpoint_path: Optional[str] = None,  # save_isam2 every progress tick
) -> CityResult:
    prior_sig = np.asarray(
        noise.diagonal_sigmas(np.asarray([1e-4, 1e-4, 1e-4]))
    )
    pose_sig = np.asarray(
        noise.diagonal_sigmas(np.asarray([1.0 / 30.0, 1.0 / 30.0, 1.0 / 100.0]))
    )
    # loop closures always take the reference harness's weak-noise branch
    # (ISAM2_City10000.cpp:118-124, isWithAmbiguity=false)
    loop_sig = np.asarray(noise.diagonal_sigmas(np.asarray([10.0] * 3)))

    isam = ISAM2(
        ISAM2Params(
            relinearize_threshold=relinearize_threshold,
            relinearize_skip=relinearize_skip,
            wildfire_threshold=wildfire_threshold,
        )
    )
    nf = NonlinearFactorGraph()
    nv = Values()
    origin = jnp.zeros(3, dtype=dtype)
    nv.insert(0, "Pose2", origin)
    nf.add(prior_factor("Pose2"), [0], origin, prior_sig)
    isam.update(nf, nv)

    lines = parse_city10000(path, max_steps)
    res = CityResult(estimate=None, n_poses=1)
    _reelim_acc: List[int] = []
    compose_j = jax.jit(pose2.compose)
    t_start = time.perf_counter()
    for (keyS, keyT, meas) in lines:
        if max_loops is not None and res.n_loop_closures >= max_loops:
            break
        odom = np.asarray(meas[0], dtype=np.dtype(dtype))
        nf = NonlinearFactorGraph()
        nv = Values()
        if keyS == keyT - 1:  # new pose
            prev = isam.calculate_estimate_key(keyS)
            nv.insert(keyT, "Pose2", compose_j(prev, odom))
            nf.add(between_factor("Pose2"), [keyS, keyT], odom, pose_sig)
            res.n_poses += 1
        else:  # loop closure
            nf.add(between_factor("Pose2"), [keyS, keyT], odom, loop_sig)
            res.n_loop_closures += 1
        t0 = time.perf_counter()
        upd = isam.update(nf, nv)
        res.step_times.append(time.perf_counter() - t0)
        _reelim_acc.append(upd.n_reeliminated)
        if progress_every and len(res.step_times) % progress_every == 0:
            try:  # release allocator free-lists (closure-sized transients
                # fragment glibc arenas into multi-GB RSS otherwise)
                import ctypes

                ctypes.CDLL("libc.so.6").malloc_trim(0)
            except Exception:
                pass
            k = len(res.step_times)
            avg = float(np.mean(res.step_times[-progress_every:])) * 1e3
            rss_gb = 0.0
            try:
                with open("/proc/self/status") as f:
                    for ln in f:
                        if ln.startswith("VmRSS"):
                            rss_gb = int(ln.split()[1]) / 1e6
                            break
            except OSError:
                pass
            seg_re = _reelim_acc[-progress_every:]
            print(
                f"step {k}: poses={res.n_poses} loops={res.n_loop_closures} "
                f"avg {avg:.1f} ms/step rss={rss_gb:.1f}GB "
                f"reelim mean {np.mean(seg_re):.0f} max {max(seg_re)}",
                flush=True,
            )
            if checkpoint_path is not None:
                from gtsam_petercdev_tpu.utils import serialization as _ser

                _ser.save_isam2(checkpoint_path, isam)
            if partial_cb is not None:
                est_p = isam.calculate_estimate()
                rows_p = np.asarray(
                    [isam.theta.row_of(i) for i in range(res.n_poses)],
                    dtype=np.int64,
                )
                res.estimate = np.asarray(est_p.params("Pose2"))[rows_p]
                res.total_time = time.perf_counter() - t_start
                partial_cb(res)
    res.total_time = time.perf_counter() - t_start
    est = isam.calculate_estimate()
    rows = np.asarray(
        [isam.theta.row_of(i) for i in range(res.n_poses)], dtype=np.int64
    )
    res.estimate = np.asarray(est.params("Pose2"))[rows]
    return res


def load_city_gt(path: str) -> np.ndarray:
    """ISAM2_GT_city10000.txt: x y theta per line."""
    return np.loadtxt(path)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data",
        default="/root/reference/examples/Data/T1_city10000_04.txt",
    )
    ap.add_argument(
        "--gt", default="/root/reference/examples/Data/ISAM2_GT_city10000.txt"
    )
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument(
        "--max-loops", type=int, default=None,
        help="stop after N loop-closure lines (reference maxLoopCount)",
    )
    ap.add_argument("--wildfire", type=float, default=0.0)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (env vars alone are overridden by the "
        "axon sitecustomize; jax.config must be set in-process)",
    )
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--progress", type=int, default=200)
    ap.add_argument("--out", default=None, help="write JSON result + traj")
    ap.add_argument(
        "--checkpoint", default=None,
        help="save_isam2 engine checkpoint every progress tick",
    )
    ap.add_argument(
        "--cache", action="store_true",
        help="enable the persistent XLA compile cache (NOTE: the XLA:CPU AOT "
        "loader can crash on machine-feature mismatches; off by default)",
    )
    args = ap.parse_args()

    try:
        # pin glibc's mmap threshold: closure transients (1-32 MB numpy
        # buffers) otherwise land on the brk heap once the dynamic
        # threshold rises, and the arena fragments into tens of GB RSS
        import ctypes

        ctypes.CDLL("libc.so.6").mallopt(-3, 131072)  # M_MMAP_THRESHOLD
    except Exception:
        pass

    if args.cache:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)

    gt = load_city_gt(args.gt)

    def _summary(r):
        st = np.asarray(r.step_times) * 1e3
        return {
            "poses": r.n_poses,
            "loops": r.n_loop_closures,
            "steps_done": len(r.step_times),
            "total_s": round(r.total_time, 1),
            "step_ms_mean": round(float(st.mean()), 2),
            "step_ms_p50": round(float(np.percentile(st, 50)), 2),
            "step_ms_p90": round(float(np.percentile(st, 90)), 2),
            "step_ms_p99": round(float(np.percentile(st, 99)), 2),
            "step_ms_max": round(float(st.max()), 1),
            "ate_rmse_m": round(r.ate_rmse(gt), 4),
            "segments_1k": [
                {
                    "steps": f"{s0}-{min(s0 + 1000, len(st))}",
                    "mean_ms": round(float(seg.mean()), 2),
                    "p50_ms": round(float(np.percentile(seg, 50)), 2),
                    "p99_ms": round(float(np.percentile(seg, 99)), 2),
                    "sum_s": round(float(seg.sum() / 1e3), 1),
                }
                for s0 in range(0, len(st), 1000)
                for seg in [st[s0 : s0 + 1000]]
            ],
        }

    def _dump(r):
        if not args.out:
            return
        import json

        with open(args.out, "w") as f:
            json.dump(_summary(r), f)
            f.write("\n")
        np.savetxt(args.out + ".traj.txt", r.estimate, fmt="%.6f")

    r = run_city10000(
        args.data,
        max_steps=args.steps,
        max_loops=args.max_loops,
        wildfire_threshold=args.wildfire,
        dtype=jnp.float32 if args.f32 else jnp.float64,
        progress_every=args.progress,
        partial_cb=_dump if args.out else None,
        checkpoint_path=args.checkpoint,
    )
    st = np.asarray(r.step_times) * 1e3
    print(
        f"poses={r.n_poses} loops={r.n_loop_closures} total={r.total_time:.1f}s "
        f"step ms: mean={st.mean():.1f} p50={np.percentile(st,50):.1f} "
        f"p99={np.percentile(st,99):.1f} max={st.max():.1f} "
        f"ATE-RMSE={r.ate_rmse(gt):.4f} m"
    )
    _dump(r)
