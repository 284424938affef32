"""Uncontended late-run timing probe: resume a checkpointed City10000
engine (utils/serialization.save_isam2) at a known dataset step and measure
a clean per-step segment — separates the full run's completion/RSS/ATE
claims (contention-immune) from its timing (contention-sensitive).

    python _city_resume_segment.py <ckpt> <resume_step> <n_steps>
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gtsam_petercdev_tpu.geometry import pose2  # noqa: E402
from gtsam_petercdev_tpu.linear import noise  # noqa: E402
from gtsam_petercdev_tpu.models.city10000 import parse_city10000  # noqa: E402
from gtsam_petercdev_tpu.nonlinear.factor_graph import (  # noqa: E402
    NonlinearFactorGraph,
)
from gtsam_petercdev_tpu.nonlinear.values import Values  # noqa: E402
from gtsam_petercdev_tpu.slam.factors import between_factor  # noqa: E402
from gtsam_petercdev_tpu.utils import serialization  # noqa: E402

DATA = "/root/reference/examples/Data/T1_city10000_04.txt"


def main():
    ckpt, resume_step, n_steps = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    pose_sig = np.asarray(
        noise.diagonal_sigmas(np.asarray([1 / 30.0, 1 / 30.0, 1 / 100.0]))
    )
    loop_sig = np.asarray(noise.diagonal_sigmas(np.asarray([10.0] * 3)))
    isam = serialization.load_isam2(ckpt)
    lines = parse_city10000(DATA, None)
    compose_j = jax.jit(pose2.compose)
    times = []
    for (keyS, keyT, meas) in lines[resume_step : resume_step + n_steps]:
        odom = np.asarray(meas[0], dtype=np.float64)
        nf = NonlinearFactorGraph()
        nv = Values()
        if keyS == keyT - 1:
            prev = isam.calculate_estimate_key(keyS)
            nv.insert(keyT, "Pose2", compose_j(prev, odom))
            nf.add(between_factor("Pose2"), [keyS, keyT], odom, pose_sig)
        else:
            nf.add(between_factor("Pose2"), [keyS, keyT], odom, loop_sig)
        t0 = time.perf_counter()
        isam.update(nf, nv)
        times.append(time.perf_counter() - t0)
    st = np.asarray(times) * 1e3
    print(
        f"RESUME step {resume_step}+{n_steps}: mean {st.mean():.1f} ms "
        f"p50 {np.percentile(st, 50):.1f} p90 {np.percentile(st, 90):.1f} "
        f"p99 {np.percentile(st, 99):.1f} max {st.max():.0f}"
    )


if __name__ == "__main__":
    main()
