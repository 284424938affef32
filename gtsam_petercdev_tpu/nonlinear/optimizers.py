"""Batch nonlinear optimizers: Gauss-Newton and Levenberg-Marquardt.

Mirrors the reference's template-method loop (NonlinearOptimizer::
defaultOptimize, gtsam/nonlinear/NonlinearOptimizer.cpp:61-117) and its
convergence test (checkConvergence, :181-230): stop when the error drops
below error_tol, or the absolute/relative decrease falls below tolerances.

LM follows LevenbergMarquardtOptimizer::tryLambda
(gtsam/nonlinear/LevenbergMarquardtOptimizer.cpp:121-239): linearize once per
outer iteration, then adjust lambda until the damped step reduces the true
cost with adequate model fidelity rho = costChange / linearizedCostChange.

Host drives the control flow; each numeric phase is one jitted device
function (linearize+assemble / damped solve / retract+error), so the hot path
is entirely compiled. Solvers: "dense" (exact scatter-assembled Cholesky),
"pcg" (matrix-free block-Jacobi CG), "multifrontal" (sparse supernodal —
inference/elimination.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from gtsam_petercdev_tpu.linear import solve as linsolve
from gtsam_petercdev_tpu.nonlinear.factor_graph import NonlinearFactorGraph
from gtsam_petercdev_tpu.nonlinear.values import Values


@dataclass
class OptimizerParams:
    max_iterations: int = 100
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    error_tol: float = 0.0
    solver: str = "dense"  # dense | pcg | multifrontal | schur | partitioned
    pcg_tol: float = 1e-10
    pcg_max_iters: int = 1000
    verbose: bool = False
    # solver="partitioned": device count (None = every visible device)
    partition_devices: Optional[int] = None


@dataclass
class LMParams(OptimizerParams):
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_upper_bound: float = 1e5
    lambda_lower_bound: float = 0.0
    diagonal_damping: bool = False
    min_model_fidelity: float = 1e-3
    max_try_iterations: int = 30


@dataclass
class DoglegParams(OptimizerParams):
    delta_initial: float = 1.0  # trust-region radius Delta0
    delta_min: float = 1e-7
    verbose_dl: bool = False


@dataclass
class OptimizerResult:
    values: Values
    error: float
    iterations: int
    converged: bool
    error_history: List[float] = field(default_factory=list)


def check_convergence(params: OptimizerParams, old: float, new: float) -> bool:
    """NonlinearOptimizer.cpp:181-230 semantics."""
    if new <= params.error_tol:
        return True
    decrease = old - new
    if abs(decrease) <= params.absolute_error_tol:
        return True
    if old > 0 and abs(decrease) <= params.relative_error_tol * old:
        return True
    return False


def _build_fns(graph: NonlinearFactorGraph, params: OptimizerParams):
    """Jitted phases closed over graph structure."""
    # Stack any staged factors NOW, outside of traced code — factor params
    # captured in closures must be concrete arrays, not tracers.
    graph._materialize()

    @jax.jit
    def err_fn(values: Values):
        return graph.error(values)

    @jax.jit
    def retract_fn(values: Values, delta):
        return values.retract(delta)

    if params.solver == "dense":
        graph._materialize()
        constrained = any(
            b.constrained_mask is not None and b.constrained_mask.any()
            for b in graph.batches
        )
        if constrained:
            # exact sigma==0 equality rows -> nullspace LSE (linear/qr.py)
            from gtsam_petercdev_tpu.linear import qr as linqr

            @jax.jit
            def assemble_fn(values: Values):
                lg = graph.linearize(values)
                return linqr.assemble_constrained(lg)

            @jax.jit
            def solve_fn(HgCd, lam):
                H, g, C, d = HgCd
                return linqr.solve_lse(
                    H, g, C, d, lam,
                    diagonal_damping=getattr(params, "diagonal_damping", False),
                )

        else:

            @jax.jit
            def assemble_fn(values: Values):
                lg = graph.linearize(values)
                return linsolve.assemble_dense(lg)

            @jax.jit
            def solve_fn(Hg, lam):
                H, g = Hg
                x = linsolve.dense_solve(
                    H, g, lam,
                    diagonal_damping=getattr(params, "diagonal_damping", False),
                )
                # linearized cost change of the UNdamped model:
                # 0.5||r||^2 - 0.5||r - J d||^2 = g.d - 0.5 d^T H d
                lin_decrease = jnp.dot(g, x) - 0.5 * jnp.dot(x, H @ x)
                return x, lin_decrease

        def solve(values, lam, cache):
            if cache.get("Hg") is None:
                cache["Hg"] = assemble_fn(values)
            Hg = cache["Hg"]
            x, lin_dec = solve_fn(Hg, jnp.asarray(lam, dtype=Hg[0].dtype))
            lg_counts = cache["lg_counts"]
            delta = _unflatten(lg_counts, x)
            return delta, lin_dec

    elif params.solver == "pcg":

        @jax.jit
        def pcg_fn(values: Values, lam):
            lg = graph.linearize(values)
            delta = linsolve.pcg_solve(
                lg,
                lam=lam,
                diagonal_damping=getattr(params, "diagonal_damping", False),
                tol=params.pcg_tol,
                max_iters=params.pcg_max_iters,
            )
            g = linsolve.gradient(lg)
            Hd = linsolve.hvp(lg, delta)
            lin_decrease = sum(jnp.vdot(g[t], delta[t]) for t in delta) - 0.5 * sum(
                jnp.vdot(delta[t], Hd[t]) for t in delta
            )
            return delta, lin_decrease

        def solve(values, lam, cache):
            return pcg_fn(values, jnp.asarray(lam))

    elif params.solver == "multifrontal":
        from gtsam_petercdev_tpu.inference import elimination

        def solve(values, lam, cache):
            return elimination.solve_linearized(
                graph, values, lam,
                diagonal_damping=getattr(params, "diagonal_damping", False),
                cache=cache,
            )

    elif params.solver == "schur":
        from gtsam_petercdev_tpu.sfm import schur

        def solve(values, lam, cache):
            return schur.solve_linearized(
                graph, values, lam,
                diagonal_damping=getattr(params, "diagonal_damping", False),
                cache=cache,
            )

    elif params.solver == "partitioned":
        # multi-device SPMD separator-Schur solve over a jax.sharding.Mesh
        # (gtsam_unstable/partition/NestedDissection.h analog); lambda flows
        # into every trial solve so LM's tryLambda retry loop works
        from gtsam_petercdev_tpu.parallel import partition as _part

        def solve(values, lam, cache):
            return _part.solve_linearized(
                graph, values, lam,
                cache=cache,
                n_parts=getattr(params, "partition_devices", None),
            )

    else:
        raise ValueError(f"unknown solver {params.solver}")

    return err_fn, retract_fn, solve


def _unflatten(type_counts, x):
    from gtsam_petercdev_tpu.core import manifold

    out = {}
    start = 0
    for t in sorted(type_counts.keys()):
        n, dim = type_counts[t], manifold.get(t).dim
        out[t] = x[start : start + n * dim].reshape(n, dim)
        start += n * dim
    return out


def _type_counts(values: Values):
    return {
        t: jax.tree_util.tree_leaves(values.params(t))[0].shape[0]
        for t in values.types()
    }


def gauss_newton(
    graph: NonlinearFactorGraph, values: Values, params: Optional[OptimizerParams] = None
) -> OptimizerResult:
    """Plain GN: linearize -> solve -> retract (GaussNewtonOptimizer.cpp)."""
    params = params or OptimizerParams()
    err_fn, retract_fn, solve = _build_fns(graph, params)
    err = float(err_fn(values))
    history = [err]
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        cache = {"lg_counts": _type_counts(values), "Hg": None}
        delta, _ = solve(values, 0.0, cache)
        values = retract_fn(values, delta)
        new_err = float(err_fn(values))
        history.append(new_err)
        if params.verbose:
            print(f"GN iter {it}: error {err:.6e} -> {new_err:.6e}")
        if check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
    return OptimizerResult(values, err, it, converged, history)


def levenberg_marquardt(
    graph: NonlinearFactorGraph, values: Values, params: Optional[LMParams] = None
) -> OptimizerResult:
    """Trust-region LM (LevenbergMarquardtOptimizer.cpp:121-300)."""
    params = params or LMParams()
    err_fn, retract_fn, solve = _build_fns(graph, params)
    err = float(err_fn(values))
    history = [err]
    lam = params.lambda_initial
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        cache = {"lg_counts": _type_counts(values), "Hg": None}
        accepted = False
        for _try in range(params.max_try_iterations):
            delta, lin_decrease = solve(values, lam, cache)
            bad = cache.pop("bad_pivots", None)
            if bad is not None and int(bad) > 0:
                # (H + lam D) indefinite at this lambda: the factorization
                # clamped pivots, so the step direction is garbage — reject
                # the trial outright and re-damp, mirroring the reference's
                # IndeterminantLinearSystemException retry
                # (LevenbergMarquardtOptimizer.cpp:155-160).
                if params.verbose:
                    print(f"LM iter {it} lam={lam:.2e}: {int(bad)} bad pivots, re-damping")
                lam *= params.lambda_factor
                if lam > params.lambda_upper_bound:
                    break
                continue
            new_values = retract_fn(values, delta)
            new_err = float(err_fn(new_values))
            cost_change = err - new_err
            lin_dec = float(lin_decrease)
            rho = cost_change / lin_dec if lin_dec > 1e-15 else -1.0
            if params.verbose:
                print(
                    f"LM iter {it} lam={lam:.2e}: {err:.6e} -> {new_err:.6e} rho={rho:.3f}"
                )
            if cost_change > 0 and rho >= params.min_model_fidelity:
                values = new_values
                lam = max(lam / params.lambda_factor, params.lambda_lower_bound)
                accepted = True
                break
            lam *= params.lambda_factor
            if lam > params.lambda_upper_bound:
                break
        if not accepted:
            converged = True  # cannot decrease further (reference: stop)
            break
        history.append(new_err)
        if check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
    return OptimizerResult(values, err, it, converged, history)


def dogleg(
    graph: NonlinearFactorGraph, values: Values, params: Optional[DoglegParams] = None
) -> OptimizerResult:
    """Powell's dogleg trust-region method.

    Mirrors DoglegOptimizerImpl::Iterate/ComputeDoglegPoint
    (gtsam/nonlinear/DoglegOptimizerImpl.h:1-255): blend the Gauss-Newton
    point with the steepest-descent Cauchy point inside a trust radius Delta;
    adapt Delta from the model-fidelity ratio rho (>=0.75 grow, <0.25 shrink).
    One jitted device function computes (H, g); a second computes the blended
    step + predicted decrease for a given Delta, so retries at shrunk Delta
    reuse the linearization.
    """
    params = params or DoglegParams()
    graph._materialize()

    @jax.jit
    def err_fn(values_in: Values):
        return graph.error(values_in)

    @jax.jit
    def retract_fn(values_in: Values, delta):
        return values_in.retract(delta)

    @jax.jit
    def assemble_fn(values_in: Values):
        lg = graph.linearize(values_in)
        return linsolve.assemble_dense(lg)

    @jax.jit
    def dogleg_step(H, g, delta_radius):
        dx_n = linsolve.dense_solve(H, g, 1e-10)  # Gauss-Newton point
        Hg = H @ g
        alpha = jnp.dot(g, g) / jnp.maximum(jnp.dot(g, Hg), 1e-30)
        dx_u = alpha * g  # Cauchy (steepest-descent) point
        n_n = jnp.linalg.norm(dx_n)
        n_u = jnp.linalg.norm(dx_u)

        # tau solving ||dx_u + tau (dx_n - dx_u)|| = Delta (ComputeBlend)
        d = dx_n - dx_u
        a = jnp.dot(d, d)
        b = 2.0 * jnp.dot(dx_u, d)
        c = jnp.dot(dx_u, dx_u) - delta_radius**2
        disc = jnp.sqrt(jnp.maximum(b * b - 4 * a * c, 0.0))
        tau = (-b + disc) / jnp.maximum(2 * a, 1e-30)
        blended = dx_u + jnp.clip(tau, 0.0, 1.0) * d

        dx = jnp.where(
            n_n <= delta_radius,
            dx_n,
            jnp.where(n_u >= delta_radius, (delta_radius / jnp.maximum(n_u, 1e-30)) * dx_u, blended),
        )
        lin_decrease = jnp.dot(g, dx) - 0.5 * jnp.dot(dx, H @ dx)
        return dx, lin_decrease, jnp.linalg.norm(dx)

    err = float(err_fn(values))
    history = [err]
    radius = params.delta_initial
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        cache_counts = _type_counts(values)
        H, g = assemble_fn(values)
        accepted = False
        while radius >= params.delta_min:
            dx, lin_dec, dx_norm = dogleg_step(H, g, jnp.asarray(radius, dtype=H.dtype))
            delta = _unflatten(cache_counts, dx)
            new_values = retract_fn(values, delta)
            new_err = float(err_fn(new_values))
            rho = (err - new_err) / max(float(lin_dec), 1e-30)
            if params.verbose:
                print(f"DL iter {it} Delta={radius:.2e}: {err:.6e} -> {new_err:.6e} rho={rho:.3f}")
            if rho >= 0.75:
                radius = max(radius, 3.0 * float(dx_norm))
            elif rho < 0.25:
                radius *= 0.5
            if new_err < err:
                values = new_values
                accepted = True
                break
        if not accepted:
            converged = True
            break
        history.append(new_err)
        if check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
    return OptimizerResult(values, err, it, converged, history)


def nonlinear_conjugate_gradient(
    graph: NonlinearFactorGraph, values: Values, params: Optional[OptimizerParams] = None
) -> OptimizerResult:
    """Manifold nonlinear CG with Fletcher-Reeves beta + backtracking line
    search (gtsam/nonlinear/NonlinearConjugateGradientOptimizer.cpp)."""
    params = params or OptimizerParams()
    graph._materialize()

    @jax.jit
    def err_fn(values_in: Values):
        return graph.error(values_in)

    @jax.jit
    def retract_fn(values_in: Values, delta):
        return values_in.retract(delta)

    @jax.jit
    def grad_fn(values_in: Values):
        lg = graph.linearize(values_in)
        return linsolve.gradient(lg)  # NEGATIVE gradient direction (J^T b)

    def dot(a, b):
        return sum(float(jnp.vdot(a[t], b[t])) for t in a)

    err = float(err_fn(values))
    history = [err]
    g = grad_fn(values)
    d = g
    gg = dot(g, g)
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        # backtracking line search along d
        step = 1.0
        accepted = False
        for _ in range(30):
            new_values = retract_fn(values, {t: step * d[t] for t in d})
            new_err = float(err_fn(new_values))
            if new_err < err:
                accepted = True
                break
            step *= 0.5
        if not accepted:
            converged = True
            break
        values = new_values
        history.append(new_err)
        if check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
        g_new = grad_fn(values)
        gg_new = dot(g_new, g_new)
        beta = gg_new / max(gg, 1e-30)  # Fletcher-Reeves
        d = {t: g_new[t] + beta * d[t] for t in d}
        g, gg = g_new, gg_new
    return OptimizerResult(values, err, it, converged, history)


def gauss_newton_mixed_precision(
    graph_dev: NonlinearFactorGraph,
    graph_host: NonlinearFactorGraph,
    values_host: Values,
    params: Optional[OptimizerParams] = None,
    lam: float = 1e-5,
) -> OptimizerResult:
    """Mixed-precision iterative-refinement Gauss-Newton (SURVEY §7's f32
    mitigation): all O(n d^3) factorization work runs in f32 on the
    accelerator, while the whitened residual (the GN right-hand side) and
    the state are evaluated in f64 on the host CPU. Classic iterative
    refinement — high-precision residual, low-precision correction solve —
    so the iteration converges to the f64 optimum even though the device
    never leaves f32.

    graph_dev: the f32 graph (device dtype); graph_host/values_host: f64
    twins of the same problem (identical factor-batch order, e.g. two
    read_g2o calls with different dtypes, the host one built under a
    `jax.enable_x64(True)` context). Host-side evaluation runs inside
    `jax.enable_x64(True)` scoped blocks, so global x64 stays off and no
    i64/f64 arrays ever reach the accelerator's compiled path. Solver is
    the supernodal multifrontal path.
    """
    import numpy as np

    from gtsam_petercdev_tpu.core import manifold
    from gtsam_petercdev_tpu.inference import elimination

    params = params or OptimizerParams()
    cpu = jax.devices("cpu")[0]
    graph_dev._materialize()
    with jax.default_device(cpu), jax.enable_x64(True):
        graph_host._materialize()

    structure = elimination.graph_structure(graph_dev, values_host)
    counts = {t: values_host._count(t) for t in values_host.types()}
    offs = elimination.type_offsets(counts)
    types = sorted(counts)
    dims = {t: manifold.get(t).dim for t in types}
    d = max(dims.values())
    n = sum(counts.values())
    var_dims = np.full(n, d, dtype=np.int64)
    for t in types:
        var_dims[offs[t] : offs[t] + counts[t]] = dims[t]
    plan = elimination.build_plan_for_graph(
        structure, n, d, max_buckets_per_level=4
    )
    maps = elimination.build_numeric_maps(plan, structure, var_dims=var_dims)

    @jax.jit
    def dev_step(v32, bs):
        lg = graph_dev.linearize(v32)
        Ab = tuple((lb.A, b) for lb, b in zip(lg.batches, bs))
        return elimination._multifrontal_solve_impl(maps, Ab, lam)

    def _to_f32(vals):
        return jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float32), vals
        )

    with jax.default_device(cpu), jax.enable_x64(True):
        err = float(graph_host.error(values_host))
    history = [err]
    converged = False
    it = 0
    for it in range(1, params.max_iterations + 1):
        with jax.default_device(cpu), jax.enable_x64(True):
            lg64 = graph_host.linearize(values_host)
            b64 = [np.asarray(lb.b) for lb in lg64.batches]
        v32 = _to_f32(values_host)
        x = np.asarray(
            dev_step(v32, tuple(jnp.asarray(b, jnp.float32) for b in b64)),
            dtype=np.float64,
        )
        delta = {
            t: x[offs[t] : offs[t] + counts[t], : dims[t]] for t in types
        }
        with jax.default_device(cpu), jax.enable_x64(True):
            values_host = values_host.retract(
                {t: jnp.asarray(v) for t, v in delta.items()}
            )
            new_err = float(graph_host.error(values_host))
        history.append(new_err)
        if params.verbose:
            print(f"GN-mixed iter {it}: {err:.6e} -> {new_err:.6e}")
        if check_convergence(params, err, new_err):
            err = new_err
            converged = True
            break
        err = new_err
    return OptimizerResult(values_host, err, it, converged, history)
