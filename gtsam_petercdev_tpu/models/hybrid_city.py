"""Hybrid_City10000-style harness (examples/Hybrid_City10000.cpp).

City10000 lines carry 1..N measurements; multi-measurement loop closures
become HYBRID between-factors — one Gaussian component per measurement
candidate, selected by a per-closure binary/discrete mode. The pruned
HybridSmoother carries <= max_leaves joint hypotheses; past
dense_dim_limit continuous dims each hypothesis's solve runs through the
sparse multifrontal engine (hybrid.eliminate_sparse).

Factors are linearized at the dead-reckoned estimates (the harness
demonstrates hybrid inference at City scale; the reference's example
likewise linearizes at its running estimate each update). Updates are
batched every `stride` steps to amortize the per-structure compile.

    python -m gtsam_petercdev_tpu.models.hybrid_city --steps 1000
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from gtsam_petercdev_tpu.models.city10000 import parse_city10000


def run_hybrid_city(
    path: str,
    max_steps: int = 1000,
    stride: int = 25,
    max_leaves: int = 8,
    progress: bool = True,
):
    import jax.numpy as jnp

    from gtsam_petercdev_tpu.geometry import pose2
    from gtsam_petercdev_tpu.hybrid.hybrid import HybridGaussianFactorGraph
    from gtsam_petercdev_tpu.hybrid.incremental import HybridSmoother

    lines = parse_city10000(path, max_steps)
    sm = HybridSmoother(max_leaves=max_leaves)
    est = {0: np.zeros(3)}
    sig = np.asarray([1 / 30.0, 1 / 30.0, 1 / 100.0])
    R = np.diag(1.0 / sig)

    def between_blocks(xa, xb, meas):
        """Whitened linearized between-factor blocks at (xa, xb)."""
        import jax

        xa = jnp.asarray(xa)
        xb = jnp.asarray(xb)
        meas = jnp.asarray(meas)

        def resid(a, b):
            return pose2.local(meas, pose2.between(a, b))

        r0 = resid(xa, xb)
        Ja = jax.jacfwd(lambda d: resid(pose2.retract(xa, d), xb))(jnp.zeros(3))
        Jb = jax.jacfwd(lambda d: resid(xa, pose2.retract(xb, d)))(jnp.zeros(3))
        Rj = jnp.asarray(R)
        return (Rj @ Ja, Rj @ Jb), -Rj @ r0

    slice_graph = HybridGaussianFactorGraph()
    # prior on pose 0
    slice_graph.add_continuous(
        [(0, 3)], (jnp.eye(3) / 1e-4,), jnp.zeros(3)
    )
    n_modes = 0
    t_updates = []
    t0_all = time.perf_counter()
    for step, (kS, kT, meas) in enumerate(lines):
        if kT == kS + 1 and kT not in est:
            import jax.numpy as jnp2

            est[kT] = np.asarray(
                pose2.compose(jnp2.asarray(est[kS]), jnp2.asarray(meas[0]))
            )
        xa, xb = est[kS], est[kT]
        if len(meas) > 1:  # hybrid closure: one component per measurement
            As, bs = [], []
            for m in meas:
                A, b = between_blocks(xa, xb, m)
                As.append(A)
                bs.append(b)
            mode = 10_000_000 + n_modes
            n_modes += 1
            slice_graph.add_hybrid(
                [(kS, 3), (kT, 3)],
                [(mode, len(meas))],
                tuple(
                    jnp.stack([As[c][k] for c in range(len(meas))])
                    for k in range(2)
                ),
                jnp.stack(bs),
            )
        else:
            A, b = between_blocks(xa, xb, meas[0])
            slice_graph.add_continuous([(kS, 3), (kT, 3)], A, b)

        if (step + 1) % stride == 0 or step + 1 == len(lines):
            t0 = time.perf_counter()
            bn = sm.update(slice_graph)
            t_updates.append(time.perf_counter() - t0)
            slice_graph = HybridGaussianFactorGraph()
            if progress and (step + 1) % (stride * 8) == 0:
                print(
                    f"step {step + 1}: poses={len(est)} modes={n_modes} "
                    f"hyps={bn.assignments.shape[0]} "
                    f"update {t_updates[-1]:.2f}s",
                    flush=True,
                )
    total = time.perf_counter() - t0_all
    ts = np.asarray(t_updates)
    return {
        "steps": len(lines),
        "poses": len(est),
        "modes": n_modes,
        "live_hypotheses": int(sm.bayes_net.assignments.shape[0]),
        "updates": len(t_updates),
        "update_s_p50": float(np.percentile(ts, 50)),
        "update_s_max": float(ts.max()),
        "total_s": total,
        "map_mode_probs": np.exp(sm.bayes_net.log_probs).tolist(),
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data", default="/root/reference/examples/Data/T1_city10000_04.txt"
    )
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--stride", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    out = run_hybrid_city(args.data, args.steps, args.stride)
    print(out)
