"""Flagship bundle-adjustment pipeline (reference: examples/SFMExample_bal.cpp).

build_ba_graph replicates the reference recipe exactly: one GeneralSFMFactor
per observation with Isotropic(2, 1.0) pixel noise, an Isotropic(9, 0.1)
prior on the first camera and Isotropic(3, 0.1) on the first landmark
(SFMExample_bal.cpp:53-69).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.core.keys import symbol
from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.optimizers import (
    LMParams,
    OptimizerResult,
    levenberg_marquardt,
)
from gtsam_petercdev_tpu.nonlinear.values import Values
from gtsam_petercdev_tpu.sfm.bal import SfmData
from gtsam_petercdev_tpu.slam.factors import prior_factor
from gtsam_petercdev_tpu.slam.projection import general_sfm_factor


def C(i: int) -> int:
    return symbol("c", i)


def P(j: int) -> int:
    return symbol("p", j)


def build_ba_graph(
    data: SfmData, pixel_sigma: float = 1.0, dtype=jnp.float64
) -> Tuple[NonlinearFactorGraph, Values]:
    graph = NonlinearFactorGraph()
    values = Values()

    for i, cam in enumerate(data.cameras):
        values.insert(C(i), "SfmCamera", cam)
    for j, tr in enumerate(data.tracks):
        values.insert(P(j), "Point3", jnp.asarray(tr.point, dtype=dtype))

    keys = []
    uvs = []
    for j, tr in enumerate(data.tracks):
        for m in range(len(tr.cam_idx)):
            keys.append([C(int(tr.cam_idx[m])), P(j)])
            uvs.append(tr.uv[m])
    keys = np.asarray(keys, dtype=np.uint64)
    uvs = jnp.asarray(np.asarray(uvs), dtype=dtype)
    graph.add_batch(
        general_sfm_factor(),
        keys,
        {"uv": uvs},
        noise.isotropic(2, pixel_sigma, dtype),
    )

    graph.add(
        prior_factor("SfmCamera"), [C(0)], data.cameras[0], noise.isotropic(9, 0.1, dtype)
    )
    graph.add(
        prior_factor("Point3"),
        [P(0)],
        jnp.asarray(data.tracks[0].point, dtype=dtype),
        noise.isotropic(3, 0.1, dtype),
    )
    return graph, values


def optimize_ba(
    data: SfmData, params: Optional[LMParams] = None, dtype=jnp.float64
) -> OptimizerResult:
    graph, values = build_ba_graph(data, dtype=dtype)
    params = params or LMParams()
    return levenberg_marquardt(graph, values, params)
