"""CustomFactor + LinearContainerFactor.

Reference: gtsam/nonlinear/CustomFactor.{h,cpp} lets Python users supply an
error callback; Jacobians are filled by the callback. Here the callback is a
pure JAX function and Jacobians come from autodiff, so `custom_factor` is a
thin FactorType constructor — the entire NoiseModelFactorN machinery
(NonlinearFactor.h:441-713) collapses into this.

LinearContainerFactor (nonlinear/LinearContainerFactor.h) wraps an existing
*linear* factor (A, b at a linearization point x0) so it can ride in a
nonlinear graph: r(x) = sum_k A_k * local(x0_k, x_k) - b.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp

from gtsam_petercdev_tpu.core import manifold
from gtsam_petercdev_tpu.nonlinear.factor_graph import FactorType


def custom_factor(
    name: str,
    var_types: Sequence[str],
    resid_dim: int,
    error_fn: Callable[[Tuple[Any, ...], Any], jnp.ndarray],
) -> FactorType:
    """User-supplied residual; Jacobians via JAX autodiff (CustomFactor.h).

    error_fn(xs, params) -> [resid_dim]; xs are single-element manifold
    params in var_types order.
    """
    return FactorType(
        name=name,
        var_types=tuple(var_types),
        resid_dim=resid_dim,
        residual=error_fn,
    )


def linear_container_factor(var_types: Sequence[str], resid_dim: int) -> FactorType:
    """params = {'A': tuple of [d, dim_k] blocks, 'b': [d], 'x0': tuple of
    linearization-point values}. r(x) = sum A_k local(x0_k, x_k) - b."""
    var_types = tuple(var_types)
    locals_ = [manifold.get(t).local for t in var_types]

    def residual(xs, params):
        r = -params["b"]
        for k, x in enumerate(xs):
            xi = locals_[k](params["x0"][k], x)
            r = r + params["A"][k] @ xi
        return r

    return FactorType(
        name=f"LinearContainer{'_'.join(var_types)}_{resid_dim}",
        var_types=var_types,
        resid_dim=resid_dim,
        residual=residual,
    )
