"""Translation averaging: MFAS outlier ordering + TranslationRecovery.

Reference: gtsam/sfm/MFAS.{h,cpp}:51 (minimum-feedback-arc-set greedy
ordering of translation-direction measurements projected on an axis;
computeOutlierWeights flags edges inconsistent with the order) and
gtsam/sfm/TranslationRecovery.{h,cpp}:51 (solve global translations from
unit direction measurements with TranslationFactor
residual = t_j - t_i - ||t_j - t_i|| * w_ij).

MFAS is pure host graph work (tiny, irregular); the recovery solve is a
standard batched LM in this framework.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from gtsam_petercdev_tpu.linear import noise
from gtsam_petercdev_tpu.nonlinear import optimizers
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType, NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


def mfas_ordering(
    edges: Sequence[Tuple[int, int]], weights: Sequence[float]
) -> List[int]:
    """Greedy minimum-feedback-arc-set ordering (MFAS.cpp).

    Edge (i, j) with weight w > 0 votes for i before j; w < 0 is treated as
    (j, i) with |w| (the reference pre-flips by projection sign). Returns a
    node order minimizing (heuristically) the total backward weight.
    """
    win: Dict[int, float] = {}
    wout: Dict[int, float] = {}
    out_adj: Dict[int, List[Tuple[int, float]]] = {}
    in_adj: Dict[int, List[Tuple[int, float]]] = {}
    nodes = set()
    for (i, j), w in zip(edges, weights):
        if w < 0:
            i, j, w = j, i, -w
        nodes.update((i, j))
        wout[i] = wout.get(i, 0.0) + w
        win[j] = win.get(j, 0.0) + w
        out_adj.setdefault(i, []).append((j, w))
        in_adj.setdefault(j, []).append((i, w))
    for n in nodes:
        win.setdefault(n, 0.0)
        wout.setdefault(n, 0.0)

    order: List[int] = []
    remaining = set(nodes)
    while remaining:
        # source nodes first; else max (wout - win) (MFAS.cpp choice)
        best, best_score = None, -np.inf
        for n in remaining:
            if win[n] < 1e-12:
                best = n
                break
            score = wout[n] - win[n]
            if score > best_score:
                best, best_score = n, score
        order.append(best)
        remaining.discard(best)
        for (j, w) in out_adj.get(best, ()):
            if j in remaining:
                win[j] -= w
        for (i, w) in in_adj.get(best, ()):
            if i in remaining:
                wout[i] -= w
    return order


def mfas_outlier_weights(
    edges: Sequence[Tuple[int, int]],
    directions: np.ndarray,  # [E, 3] unit translation directions i->j
    projection_axes: Optional[np.ndarray] = None,  # [A, 3]
) -> np.ndarray:
    """computeOutlierWeights: project directions on several axes, order each
    1D problem with MFAS, and accumulate the backward (inconsistent) weight
    per edge. High weight => likely outlier direction."""
    if projection_axes is None:
        rng = np.random.default_rng(42)
        projection_axes = rng.normal(size=(8, 3))
        projection_axes /= np.linalg.norm(projection_axes, axis=1, keepdims=True)
    E = len(edges)
    out = np.zeros(E)
    for ax in projection_axes:
        w = directions @ ax  # signed 1D weights
        order = mfas_ordering(edges, w)
        pos = {n: k for k, n in enumerate(order)}
        for e, ((i, j), we) in enumerate(zip(edges, w)):
            if we >= 0 and pos[i] > pos[j]:
                out[e] += we
            elif we < 0 and pos[j] > pos[i]:
                out[e] += -we
    return out / len(projection_axes)


# --- translation recovery ----------------------------------------------------


def _translation_factor() -> FactorType:
    """residual = t_j - t_i - ||t_j - t_i|| * w_ij (TranslationFactor.h)."""

    def residual(xs, params):
        ti, tj = xs
        d = tj - ti
        n = jnp.sqrt(jnp.sum(d * d) + 1e-18)
        return d - n * params

    return FactorType(
        name="TranslationDirection",
        var_types=("Point3", "Point3"),
        resid_dim=3,
        residual=residual,
    )


def recover_translations(
    edges: Sequence[Tuple[int, int]],
    directions,  # [E, 3] unit vectors (t_j - t_i direction), world frame
    scale_anchor: float = 1.0,
    sigma: float = 0.01,
    init: Optional[Dict[int, np.ndarray]] = None,
    params: Optional[optimizers.LMParams] = None,
    dtype=jnp.float64,
) -> Values:
    """TranslationRecovery::run — gauge fixed by anchoring node0 at the
    origin and the first edge's length at `scale_anchor` (the reference adds
    equivalent priors)."""
    directions = np.asarray(directions, dtype=np.float64)
    nodes = sorted({n for e in edges for n in e})
    rng = np.random.default_rng(7)
    values = Values()
    for n in nodes:
        if init is not None and n in init:
            v0 = np.asarray(init[n], dtype=np.float64)
        else:
            v0 = rng.normal(size=3)
        values.insert(n, "Point3", jnp.asarray(v0, dtype=dtype))

    graph = NonlinearFactorGraph()
    ft = _translation_factor()
    model = noise.isotropic(3, sigma, dtype)
    for (i, j), w in zip(edges, directions):
        graph.add(ft, [i, j], jnp.asarray(w, dtype=dtype), model)

    # gauge: t_{node0} = 0; t_{j0} = anchor * w_0 (fixes global scale)
    def prior_res(xs, params_):
        (x,) = xs
        return x - params_

    pf = FactorType("TranslationPrior", ("Point3",), 3, prior_res)
    i0, j0 = edges[0]
    graph.add(pf, [i0], jnp.zeros(3, dtype=dtype), noise.isotropic(3, 1e-6, dtype))
    graph.add(
        pf,
        [j0],
        jnp.asarray(scale_anchor * directions[0], dtype=dtype),
        noise.isotropic(3, 1e-6, dtype),
    )
    res = optimizers.levenberg_marquardt(
        graph, values, params or optimizers.LMParams(max_iterations=60)
    )
    return res.values
