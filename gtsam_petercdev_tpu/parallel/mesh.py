"""Device meshes and distributed solve steps.

The reference has NO distributed backend (SURVEY §2.10, §5.8) — its
parallelism is TBB task trees on shared memory. The TPU-native replacement:

  * Factor-parallel ("DP") linearization: factor batches are sharded across
    the mesh's `factors` axis with shard_map; each device linearizes its
    shard and scatter-adds its contribution to (H, g); one `psum` reduces.
    This is the device analog of the reference's tbb::parallel_for over
    factors (gtsam/nonlinear/NonlinearFactorGraph.cpp:246-262).
  * The reduced system is solved replicated (small/medium D) or — for the
    partitioned large-map path (separator Schur complement) — see
    parallel/partition.py.

All shardings go through jax.sharding + shard_map so the same code runs on a
virtual CPU mesh (tests / dryrun) and a real TPU slice over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


def make_mesh(n_devices: Optional[int] = None, axis: str = "factors") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _pad_batch(arr, n, axis=0):
    """Pad the leading axis to a multiple of n by REPLICATING the last row —
    padded factors must stay numerically benign (a zeroed Pose3 would push
    NaNs through jacfwd, and NaN*mask is still NaN)."""
    pad = (-arr.shape[axis]) % n
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, mode="edge")


def distributed_normal_equations(graph: NonlinearFactorGraph, values: Values, mesh: Mesh):
    """Build a jitted fn(values) -> (H, g) with factor-sharded linearization.

    Jacobian blocks are computed on the device owning each factor shard; the
    dense (H, g) contributions are scatter-added locally and `psum`-reduced
    over the mesh (ICI) — zero host involvement in the hot loop.
    """
    graph._materialize()
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    # Host-side plan: per batch, rows + validity mask over the PADDED length.
    plans = []
    for batch in graph.batches:
        rows = tuple(
            values.rows(batch.keys[:, k], t)
            for k, t in enumerate(batch.ftype.var_types)
        )
        n = batch.size
        n_pad = n + ((-n) % n_dev)
        mask = np.zeros(n_pad, dtype=np.float32)
        mask[:n] = 1.0
        plans.append((batch, rows, mask))

    type_counts = {
        t: jax.tree_util.tree_leaves(values.params(t))[0].shape[0]
        for t in values.types()
    }
    off = {}
    D = 0
    for t in sorted(type_counts.keys()):
        off[t] = D
        D += type_counts[t] * manifold.get(t).dim

    from jax import shard_map

    def step(values_in: Values):
        def shard_body(*flat_args):
            # flat_args: per batch (params, sqrt_info, mask, rows..., xs...)
            H = jnp.zeros((D, D), dtype=jnp.result_type(*jax.tree_util.tree_leaves(values_in)))
            g = jnp.zeros((D,), dtype=H.dtype)
            idx = 0
            for (batch, _rows, _mask) in plans:
                k_slots = len(batch.ftype.var_types)
                params = flat_args[idx]; idx += 1
                sqrt_info = flat_args[idx]; idx += 1
                mask = flat_args[idx]; idx += 1
                rows = flat_args[idx : idx + k_slots]; idx += k_slots
                xs = flat_args[idx : idx + k_slots]; idx += k_slots
                r_w, Js = graph._residual_and_jac(
                    _ShardBatch(batch.ftype, params, sqrt_info, batch.robust), xs
                )
                # explicit accumulator dtype: scatter-adding f64 updates
                # into an f32 H is a JAX FutureWarning (soon an error)
                r_w = (r_w * mask[:, None]).astype(H.dtype)
                Js = tuple(
                    (Jk * mask[:, None, None]).astype(H.dtype) for Jk in Js
                )
                b = -r_w
                gidx = []
                for k, t in enumerate(batch.ftype.var_types):
                    dk = manifold.get(t).dim
                    base = off[t] + rows[k].astype(jnp.int32) * dk
                    gidx.append(base[:, None] + jnp.arange(dk, dtype=jnp.int32)[None, :])
                for k in range(k_slots):
                    g_contrib = jnp.einsum("ndk,nd->nk", Js[k], b)
                    g = g.at[gidx[k]].add(g_contrib)
                    for l in range(k_slots):
                        blk = jnp.einsum("ndi,ndj->nij", Js[k], Js[l])
                        H = H.at[gidx[k][:, :, None], gidx[l][:, None, :]].add(blk)
            H = jax.lax.psum(H, axis)
            g = jax.lax.psum(g, axis)
            return H, g

        flat_args = []
        for (batch, rows, mask) in plans:
            xs = graph._gather(values_in, batch, rows)
            parts = (
                [batch.params, batch.sqrt_info, jnp.asarray(mask)]
                + [jnp.asarray(r) for r in rows]
                + list(xs)
            )
            for p in parts:
                flat_args.append(
                    jax.tree_util.tree_map(lambda a: _pad_batch(a, n_dev), p)
                )

        fn = shard_map(
            shard_body,
            mesh=mesh,
            in_specs=tuple(
                jax.tree_util.tree_map(lambda _: P(axis), a) for a in flat_args
            ),
            out_specs=(P(), P()),
        )
        return fn(*flat_args)

    return step, type_counts


class _ShardBatch:
    """Lightweight stand-in for FactorBatch inside shard_map bodies."""

    def __init__(self, ftype, params, sqrt_info, robust):
        self.ftype = ftype
        self.params = params
        self.sqrt_info = sqrt_info
        self.robust = robust


def distributed_gn_step(graph: NonlinearFactorGraph, values: Values, mesh: Mesh):
    """One full distributed Gauss-Newton step: sharded linearize+reduce,
    replicated dense solve, vectorized retract. Returns jittable fn."""
    ne_step, type_counts = distributed_normal_equations(graph, values, mesh)

    def step(values_in: Values, lam):
        H, g = ne_step(values_in)
        x = linsolve.dense_solve(H, g, lam)
        delta = {}
        start = 0
        for t in sorted(type_counts.keys()):
            n, dim = type_counts[t], manifold.get(t).dim
            delta[t] = x[start : start + n * dim].reshape(n, dim)
            start += n * dim
        return values_in.retract(delta)

    return step
