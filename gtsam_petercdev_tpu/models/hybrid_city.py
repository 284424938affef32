"""Hybrid_City10000 harness — reference semantics on per-hypothesis ISAM2.

Reference: examples/Hybrid_City10000.cpp + City10000.h. Semantics mirrored:
  * EVERY loop-closure line becomes a BINARY hybrid factor: component 0 is
    the between measurement under the open-loop model (sigmas 10), component
    1 the same measurement under the pose model (1/30,1/30,1/100)
    (`hybridLoopClosureFactor`, Hybrid_City10000.cpp:71-89); the component
    log-normalizers (negLogConstant, City10000.h:28,35) weight the modes.
  * multi-measurement ODOMETRY lines become hybrid odometry factors: one
    component per measurement candidate under the pose model
    (`hybridOdometryFactor`, :91-104).
  * the smoother carries at most maxNrHypotheses=10 joint hypotheses
    (pruned by posterior), default parameters :52-64.

TPU-native/incremental design (this repo): each live hypothesis IS a full
ISAM2 instance (numpy incremental engine + native sweeps) holding its own
selected measurements, linearization points, and Bayes tree — so every
hypothesis relinearizes continuously with the production ISAM2 machinery
(relinearizeThreshold 0.01, skip 1) instead of the reference's periodic
reInitialize. Hypothesis forks use the engine checkpoint serializer
(utils/serialization.isam2_to_bytes) — an exact state fork. The hypothesis
posterior is the Laplace weight the reference's hybrid elimination
computes per leaf:

    log w = log_phi (component normalizers) - E(x*) - 1/2 log det H

with E the nonlinear error at the hypothesis's own MAP estimate and
log det H read off the engine's cached clique Cholesky diagonals.

    python -m gtsam_petercdev_tpu.models.hybrid_city --cpu --steps 2000
"""

from __future__ import annotations

import argparse
import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from gtsam_petercdev_tpu.models.city10000 import parse_city10000


def _neg_log_constant(sigmas: np.ndarray) -> float:
    """noiseModel::Gaussian::negLogConstant: -log(normalizer) =
    0.5*d*log(2*pi) + sum(log sigma)."""
    d = len(sigmas)
    return 0.5 * d * math.log(2.0 * math.pi) + float(np.sum(np.log(sigmas)))


@dataclass
class _Hypothesis:
    isam: object
    log_phi: float = 0.0  # -sum of selected-component negLogConstants
    choices: List[int] = field(default_factory=list)


def _engine_logdet(isam) -> float:
    """2 * sum(log diag(L)) over live cliques (log det of the full Hessian
    at the current linearization point)."""
    eng = isam.engine
    tot = 0.0
    for pay in eng.payloads.values():
        dg = np.diagonal(pay.L)
        tot += 2.0 * float(np.sum(np.log(np.maximum(dg, 1e-300))))
    return tot


def run_hybrid_city(
    path: str,
    max_steps: int = 2000,
    max_hypotheses: int = 10,
    prune_every: int = 1,
    progress: int = 200,
):
    import jax.numpy as jnp

    from gtsam_petercdev_tpu.geometry import pose2
    from gtsam_petercdev_tpu.linear import noise
    from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
    from gtsam_petercdev_tpu.nonlinear.isam2 import ISAM2, ISAM2Params
    from gtsam_petercdev_tpu.nonlinear.values import Values
    from gtsam_petercdev_tpu.slam.factors import between_factor, prior_factor
    from gtsam_petercdev_tpu.utils import serialization as ser

    pose_sigmas = np.asarray([1 / 30.0, 1 / 30.0, 1 / 100.0])
    open_sigmas = np.asarray([10.0, 10.0, 10.0])
    prior_sig = np.asarray(noise.diagonal_sigmas(np.asarray([1e-4] * 3)))
    pose_sig = np.asarray(noise.diagonal_sigmas(pose_sigmas))
    open_sig = np.asarray(noise.diagonal_sigmas(open_sigmas))
    c_pose = _neg_log_constant(pose_sigmas)
    c_open = _neg_log_constant(open_sigmas)

    def fresh() -> _Hypothesis:
        isam = ISAM2(ISAM2Params(relinearize_threshold=0.01,
                                 relinearize_skip=1, wildfire_threshold=0.0))
        nf, nv = NonlinearFactorGraph(), Values()
        nv.insert(0, "Pose2", jnp.zeros(3))
        nf.add(prior_factor("Pose2"), [0], jnp.zeros(3), prior_sig)
        isam.update(nf, nv)
        return _Hypothesis(isam=isam)

    def fork(h: _Hypothesis) -> _Hypothesis:
        blob = ser.isam2_to_bytes(h.isam)
        return _Hypothesis(
            isam=ser.isam2_from_bytes(blob),
            log_phi=h.log_phi,
            choices=list(h.choices),
        )

    def apply(h: _Hypothesis, keyS, keyT, meas, sig, logc, new_pose: bool):
        nf, nv = NonlinearFactorGraph(), Values()
        meas = jnp.asarray(meas)
        if new_pose:
            prev = h.isam.calculate_estimate_key(keyS)
            nv.insert(keyT, "Pose2", pose2.compose(prev, meas))
        nf.add(between_factor("Pose2"), [keyS, keyT], meas, sig)
        h.isam.update(nf, nv)
        h.log_phi -= logc

    def weights(hyps: List[_Hypothesis]) -> np.ndarray:
        lw = np.asarray([
            h.log_phi - h.isam.error() - 0.5 * _engine_logdet(h.isam)
            for h in hyps
        ])
        lw = lw - (np.log(np.sum(np.exp(lw - lw.max()))) + lw.max())
        return lw

    lines = parse_city10000(path, max_steps)
    hyps = [fresh()]
    n_modes = 0
    n_poses = 1
    step_times: List[float] = []
    t_all = time.perf_counter()
    for si, (keyS, keyT, meas) in enumerate(lines):
        t0 = time.perf_counter()
        is_odo = keyT == keyS + 1
        if is_odo:
            n_poses += 1
            if len(meas) > 1:  # hybrid odometry: fork per candidate
                n_modes += 1
                children = []
                for h in hyps:
                    kids = [h] + [fork(h) for _ in meas[1:]]
                    for c_i, (kid, m) in enumerate(zip(kids, meas)):
                        apply(kid, keyS, keyT, m, pose_sig, c_pose, True)
                        kid.choices.append(c_i)
                    children.extend(kids)
                hyps = children
            else:
                for h in hyps:
                    apply(h, keyS, keyT, meas[0], pose_sig, c_pose, True)
        else:  # loop closure: ALWAYS binary hybrid (open-loop vs accept)
            n_modes += 1
            children = []
            for h in hyps:
                kid = fork(h)
                apply(h, keyS, keyT, meas[0], open_sig, c_open, False)
                h.choices.append(0)
                apply(kid, keyS, keyT, meas[0], pose_sig, c_pose, False)
                kid.choices.append(1)
                children.extend([h, kid])
            hyps = children
        if len(hyps) > max_hypotheses and (si % prune_every == 0):
            lw = weights(hyps)
            order = np.argsort(-lw)[:max_hypotheses]
            hyps = [hyps[i] for i in order]
        step_times.append(time.perf_counter() - t0)
        if progress and (si + 1) % progress == 0:
            seg = np.asarray(step_times[-progress:]) * 1e3
            print(
                f"line {si+1}: poses={n_poses} modes={n_modes} "
                f"hyps={len(hyps)} seg mean {seg.mean():.0f} ms "
                f"p50 {np.percentile(seg, 50):.0f} ms",
                flush=True,
            )
    lw = weights(hyps)
    best = hyps[int(np.argmax(lw))]
    est = best.isam.calculate_estimate()
    traj = np.asarray(
        [np.asarray(est.at(k)) for k in range(n_poses)]
    )
    st = np.asarray(step_times) * 1e3
    accept_frac = (
        float(np.mean(np.asarray(best.choices) == 1)) if best.choices else 1.0
    )
    return {
        "lines": len(lines),
        "poses": n_poses,
        "modes": n_modes,
        "live_hypotheses": len(hyps),
        "posterior": np.exp(lw).round(4).tolist(),
        "best_loop_accept_frac": accept_frac,
        "step_ms_p50": float(np.percentile(st, 50)),
        "step_ms_p90": float(np.percentile(st, 90)),
        "step_ms_mean": float(st.mean()),
        "total_s": time.perf_counter() - t_all,
        "traj": traj,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data", default="/root/reference/examples/Data/T1_city10000_04.txt"
    )
    ap.add_argument(
        "--gt", default="/root/reference/examples/Data/ISAM2_GT_city10000.txt"
    )
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--max-hypotheses", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    out = run_hybrid_city(args.data, args.steps,
                          max_hypotheses=args.max_hypotheses)
    traj = out.pop("traj")
    gt = np.loadtxt(args.gt)
    n = min(len(traj), len(gt))
    d2 = traj[:n, :2] - gt[:n, :2]
    out["ate_rmse_m"] = round(float(np.sqrt(np.mean(np.sum(d2 * d2, 1)))), 4)
    print(out)
