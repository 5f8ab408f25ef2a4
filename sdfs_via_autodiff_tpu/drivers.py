"""High-level drivers: model -> grids -> operator -> solver -> checkpoint.

End-to-end parity with the reference drivers ``wc_ratio_continuous``
(``ssy_wc_ratio_continuous.py:229-297``, ``gcy_wc_ratio_continuous.py:
264-335``) and the discrete test drivers (``ssy_wc_ratio.py:216-240``,
``gcy_wc_ratio.py:319-340``), with a structured result instead of prints,
checkpointing via :mod:`.utils.checkpoint`, and a log-space default for the
iterate: solving on ell = log w enforces w > 0 (Newton in w space can step
to negative w, where w^theta is undefined), is required on TPU (w^theta
underflows the f32 exponent range there), and reproduces the w-space fixed
point to ~1e-12 relative.  Pass ``space="w"`` for strict reference
semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .models.gcy import GCY
from .models.ssy import SSY
from .operators.continuous_gcy import T_gcy_continuous_factory, build_grid_gcy
from .operators.continuous_ssy import T_ssy_continuous_factory, build_grid_ssy
from .operators.discrete_gcy import T_gcy_factory, discretize_gcy
from .operators.discrete_ssy import T_ssy_factory, discretize_ssy
from .solvers import SolveResult, solve
from .utils.checkpoint import save_solution

__all__ = ["WCSolution", "wc_ratio_discrete", "wc_ratio_continuous",
           "wc_ratio_continuation", "wc_ratio_sweep", "prolong_w",
           "DeGrootSolution", "degroot_fixed_point"]

DEFAULT_INIT_W = 800.0   # reference w_init, ssy_wc_ratio.py:233


@dataclasses.dataclass
class WCSolution:
    """Wealth-consumption-ratio solve output: w* plus how we got it."""
    w_star: jnp.ndarray
    grids: Optional[Tuple[jnp.ndarray, ...]]
    result: SolveResult
    space: str

    @property
    def converged(self) -> bool:
        return bool(self.result.converged)


def _auto_space() -> str:
    # Log space is the robust default everywhere (see module docstring);
    # this hook exists so the policy is overridable in one place.
    return "log"


def f32_tol_floor(theta: Optional[float]) -> float:
    """Practical float32 sup-norm floor of the log iterate, scaled by the
    risk-aversion exponent theta.

    The per-application f32 bias (~3 ulp of the log iterate) amplifies by
    the fixed-point factor 1/(1-rate) into the solution (docs/precision.md);
    the attainable residual floor additionally grows with |theta| because
    w = 1 + beta (H w^theta)^(1/theta) wraps every evaluation in a
    theta-power round trip.  Measured anchors: SSY (theta ~ -16) iterates
    reach ~4e-6 (NORTHSTAR residuals 1.7e-6 after convergence, stalls
    below ~5e-6); GCY (theta ~ -36) stalled at tol 2.2e-5 and converges
    at 3e-5 (examples/scale_demo.py, commit ea7db2a) — consistent with a
    quadratic |theta| scaling from the two theta-scaled transcendental
    round trips per application.
    """
    if theta is None:
        return 5e-6
    return 5e-6 * max(1.0, (abs(float(theta)) / 16.0) ** 2)


def _polish_stage(polish) -> str:
    """Normalize the ``polish`` kwarg to a stage placement.

    ``True``/``"host"`` -> f64 refine on the host CPU (true IEEE f64);
    ``"device"`` -> f64 refine on the default backend (on TPU: the
    float32-range double-float emulation, which the log-space operators
    stay inside by construction)."""
    if polish is True:
        return "host"
    if polish in ("host", "device"):
        return polish
    raise ValueError(f"polish must be True, 'host', or 'device', "
                     f"got {polish!r}")


def _newton_applicable(solver_opts: dict) -> dict:
    """Subset of user solver options accepted by the Newton solver — the
    polish stages always refine with Newton, whatever the fast stage ran."""
    import inspect

    from .solvers.fixed_point import newton_solver
    allowed = set(inspect.signature(newton_solver).parameters) - {"T", "x0"}
    return {k: v for k, v in solver_opts.items() if k in allowed}


def _default_algorithm(model, kernel: str) -> str:
    """Per-path solver default (see ``wc_ratio_continuous`` docstring):
    SA for the continuous-GCY pair tier — where the primal kernel is
    ~3 ms/app at 18.9M points and SA's ~0.98/iter contraction makes a
    device-resident SA loop the fastest route to the f32 floor —
    Newton-Kantorovich everywhere else."""
    return ("sa" if (kernel == "tiled" and not isinstance(model, SSY))
            else "newton")


def _run_solver(T, w0, space, algorithm, tol, solver_opts,
                theta: Optional[float] = None) -> WCSolution:
    import warnings
    floor = f32_tol_floor(theta)
    if jnp.result_type(w0) == jnp.float32 and tol < floor:
        warnings.warn(
            f"tol={tol:g} is below the float32 iteration floor "
            f"(~{floor:.0e} on the log iterate for theta={theta}); the "
            "solve may stall (stall guard -> converged=False). Use "
            "float64, polish=True, or relax tol.", stacklevel=3)
    if space == "log":
        x0 = jnp.log(w0)
        res = solve(T, x0, method=algorithm, tol=tol, **solver_opts)
        w_star = jnp.exp(res.x)
    else:
        res = solve(T, w0, method=algorithm, tol=tol, **solver_opts)
        w_star = res.x
    return WCSolution(w_star=w_star, grids=None, result=res, space=space)


def wc_ratio_discrete(model,
                      shapes: Sequence[int],
                      *,
                      algorithm: str = "newton",
                      tol: float = 1e-7,
                      space: Optional[str] = None,
                      w_init=None,
                      dtype=None,
                      kernel: str = "xla",
                      baseline: Optional[str] = None,
                      discretization: str = "rouwenhorst",
                      polish=False,  # True | 'host' | 'device'
                      checkpoint_path: Optional[str] = None,
                      **solver_opts) -> WCSolution:
    """Solve the discretized (Rouwenhorst tensor-grid) model.

    Parity: reference ``test_compute_wc_ratio_ssy`` / ``..._gcy``
    (``ssy_wc_ratio.py:216-240``, ``gcy_wc_ratio.py:319-340``).

    ``polish=True`` (meaningful for the float32 tiled tier): after the
    fast solve, refine with float64 Newton through the XLA operator
    warm-started from it, run on the host CPU when the default backend
    is an accelerator — the same two-stage recipe as the continuous
    driver's polish (reference default tol 1e-7, ``solvers.py:16``, at
    10^7-point grids despite the f32 fast tier's ~1e-5 floor).
    ``polish="device"`` runs the f64 stage on the default accelerator
    instead: on TPU that is the double-float "f64" emulation — array
    exp/log/matmul at ~1e-15 but float32 *range*, which the log-space
    operator stays inside by construction — trading the host stage's
    minutes at 10^7 points for emulated-f64 device speed.
    ``polish="host"`` is the explicit spelling of ``True``.

    ``kernel="tiled"`` (float32, log space) runs the operator through the
    strip-streamed Pallas kernels — the large-grid fast tier (no VMEM
    size cap; see ``kernels/tiled_two_phase.py``).  SSY uses the native
    4-D two-phase grouping; GCY folds its six axes into the same
    structure by Kronecker grouping.  ``baseline="loglinear"`` is
    supported for both: for GCY it conjugates the log-linear baseline
    into the factors (rank-2 lazy batched column factors), extending
    f32 coverage to moderately wide Rouwenhorst grids whose plain
    operands warn/NaN.  The conjugated route has its own, later f32
    envelope (shared-factor entries below f32's floor flush to zero;
    the factory warns past factor log-range -150, docs/math.md §6b) —
    beyond it use ``kernel="xla"`` with ``baseline="loglinear"`` (the
    per-axis normalized chain) or ``discretization="tauchen"``.

    ``discretization="tauchen"`` swaps the Rouwenhorst construction for
    Tauchen's: its grid spans a fixed ±3 unconditional std at ANY point
    count, making fine f32 discrete grids range-safe (Rouwenhorst
    ladders widen like ±sqrt(n-1) sigma — keep h-axes at <=32 points
    there; docs/status.md #1 and the NORTHSTAR discrete case).
    """
    space = space or _auto_space()
    if kernel not in ("xla", "tiled"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if polish:
        import contextlib

        import jax

        stage = _polish_stage(polish)
        fast = wc_ratio_discrete(
            model, shapes, algorithm=algorithm, tol=max(tol, 1e-4),
            space=space, w_init=w_init, dtype=dtype, kernel=kernel,
            baseline=baseline, discretization=discretization,
            **solver_opts)
        ctx = contextlib.nullcontext()
        if stage == "host" and jax.default_backend() != "cpu":
            ctx = jax.default_device(jax.devices("cpu")[0])
        popts = _newton_applicable(solver_opts)
        if (stage == "device" and kernel == "tiled"
                and "tangent_T" not in popts):
            # Mixed-precision iterative refinement (newton_solver's
            # ``tangent_T``): the f64 stage's inner Krylov matvecs run
            # through the f32 tiled kernel's tangent instead of the
            # emulated-f64 chain — the residual and safeguard stay f64,
            # so the refinement still converges to f64 accuracy, at
            # fast-tier per-matvec cost.  The solve below iterates the
            # log-w field (space="log"), which is exactly the tiled
            # kernels' iterate, so shapes and semantics line up.
            try:
                if isinstance(model, SSY):
                    from .kernels.tiled_two_phase import (
                        make_tiled_T_log_ssy)
                    dsc = discretize_ssy(model, tuple(shapes),
                                         method=discretization)
                    popts["tangent_T"] = make_tiled_T_log_ssy(
                        model, dsc, baseline=baseline)
                elif isinstance(model, GCY):
                    from .kernels.tiled_two_phase import (
                        make_tiled_T_log_gcy)
                    dsc = discretize_gcy(model, tuple(shapes),
                                         method=discretization)
                    popts["tangent_T"] = make_tiled_T_log_gcy(
                        model, dsc, baseline=baseline)
            except Exception:
                pass                  # fall back to the f64 tangent
        with ctx:
            # f64 Newton refine through the XLA operator (the tiled
            # kernels are the f32 tier); baseline intentionally dropped
            # — f64 needs no range fold (see the continuous twin).
            return wc_ratio_discrete(
                model, shapes, algorithm="newton", tol=tol, space="log",
                discretization=discretization,
                w_init=jnp.asarray(np.asarray(fast.w_star), jnp.float64),
                checkpoint_path=checkpoint_path,
                **popts)
    if kernel == "tiled":
        if space != "log":
            raise ValueError("tiled kernels iterate in log space")
        if isinstance(model, SSY):
            from .kernels.tiled_two_phase import make_tiled_T_log_ssy
            disc = discretize_ssy(model, tuple(shapes),
                                  method=discretization)
            T = make_tiled_T_log_ssy(model, disc, baseline=baseline)
        elif isinstance(model, GCY):
            from .kernels.tiled_two_phase import make_tiled_T_log_gcy
            from .operators.discrete_gcy import gcy_loglinear_parts
            disc = discretize_gcy(model, tuple(shapes),
                                  method=discretization)
            # baseline="loglinear" runs the normalized operand set
            # (rank-2 lazy conjugated column factors) — the range-safe
            # f32 recipe for wide-Rouwenhorst grids whose plain
            # operands warn/NaN.
            T = make_tiled_T_log_gcy(model, disc, baseline=baseline)
            if w_init is None:
                # Log-linear warm start (reference test_newton.md:60-66
                # practice): beta = 0.9987 makes cold starts crawl.
                # baseline="loglinear" already built the full-grid ell0
                # inside the normalized operand factory — reuse it
                # rather than recomputing the ~O(N)-sized f64 field.
                ell0 = getattr(T, "baseline_log_w", None)
                if ell0 is None:
                    ell0 = gcy_loglinear_parts(model, disc)["ell0"]
                w_init = jnp.exp(jnp.asarray(ell0, jnp.float32))
        else:
            raise TypeError(f"unsupported model {type(model).__name__}")
        w0 = (jnp.full(tuple(shapes), DEFAULT_INIT_W, jnp.float32)
              if w_init is None else jnp.asarray(w_init, jnp.float32))
        sol = _run_solver(T, w0, space, algorithm, tol, solver_opts,
                          theta=model.theta)
        if checkpoint_path:
            save_solution(checkpoint_path, model, (), sol.w_star,
                          meta=dict(kind="discrete", shapes=list(shapes),
                                    algorithm=algorithm, tol=tol,
                                    space=space, kernel="tiled",
                                    iterations=int(sol.result.iterations),
                                    residual=float(sol.result.residual)))
        return sol
    # The discretization is always built in float64: the grid ladders
    # define the discrete model, and f32-rounded ladders shift its fixed
    # point by up to ~1e-2 after the beta ~ 1 amplification (measured on
    # wide GCY grids).  ``dtype`` only selects the operator's working
    # precision — the factories cast the arrays.
    if isinstance(model, SSY):
        disc = discretize_ssy(model, tuple(shapes), method=discretization)
        T = T_ssy_factory(model, disc, space=space, dtype=dtype,
                          baseline=baseline)
    elif isinstance(model, GCY):
        disc = discretize_gcy(model, tuple(shapes), method=discretization)
        T = T_gcy_factory(model, disc, space=space, dtype=dtype,
                          baseline=baseline)
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")

    w0 = (jnp.full(tuple(shapes), DEFAULT_INIT_W, dtype=dtype or jnp.float64)
          if w_init is None else jnp.asarray(w_init))
    sol = _run_solver(T, w0, space, algorithm, tol, solver_opts,
                          theta=model.theta)
    if checkpoint_path:
        save_solution(checkpoint_path, model, (), sol.w_star,
                      meta=dict(kind="discrete", shapes=list(shapes),
                                algorithm=algorithm, tol=tol, space=space,
                                iterations=int(sol.result.iterations),
                                residual=float(sol.result.residual)))
    return sol


def wc_ratio_continuous(model,
                        grid_sizes: Sequence[int],
                        *,
                        num_std_devs: float = 3.2,
                        method: str = "quadrature",
                        interp: str = "pre",
                        quad_degree: int = 5,
                        mc_draw_size: int = 2000,
                        seed: int = 1234,
                        algorithm: Optional[str] = None,
                        tol: float = 1e-7,
                        space: Optional[str] = None,
                        w_init=None,
                        batch_size: Optional[int] = None,
                        baseline: Optional[str] = None,
                        dtype=None,
                        kernel: str = "xla",
                        engine: str = "auto",
                        polish=False,  # True | 'host' | 'device'
                        checkpoint_path: Optional[str] = None,
                        **solver_opts) -> WCSolution:
    """Solve the continuous-state model on interpolation grids.

    ``kernel="tiled"`` (quadrature, log space, f32) runs the operator
    through the Pallas kernels: SSY interp="pre" through the
    strip-streamed two-phase kernels — the large-grid fast tier (see
    NORTHSTAR.json: 0.5 s Newton steps at 11M points) — SSY
    interp="post"/"loglin" through the fused Kronecker node-pair kernel
    (``kernels/post_interp_kernel.py``), and GCY interp="pre" through
    the streamed *pair* configuration (conditioned z/z_pi expectations
    contracted per-slice in VMEM; needs n_z % 128 == 0 and
    baseline normalization — see
    ``kernels/tiled_two_phase.make_tiled_T_log_gcy_continuous``).
    Combine with ``polish=True`` for full accuracy.

    ``engine`` selects the XLA evaluation strategy for post/loglin
    semantics: "auto" (node-chain matmuls in log space), or "gather"
    (the reference's pointwise corner-gather formulation).

    Parity: reference ``wc_ratio_continuous``
    (``ssy_wc_ratio_continuous.py:229-297``); grid bounds via
    ``num_std_devs`` stationary standard deviations, Gauss-Hermite degree
    ``quad_degree`` per dimension or ``mc_draw_size`` Monte Carlo draws,
    initial guess all-ones (reference :243-245) unless ``w_init`` given.

    ``algorithm=None`` resolves per path: "sa" for the GCY pair tier
    (measured on TPU at 18.9M points: the pair kernel costs ~3 ms per
    application and SA contracts at ~0.98/iter, so a device-resident SA
    loop solves in seconds, while Newton's inner matvecs through the
    XLA pair twin under-resolve cond(I - T') at any bounded
    inner_maxiter and Anderson's extrapolation can exit the coarse
    baseline's f32 exp envelope); "newton" everywhere else.

    ``baseline="coarse"`` (the float32 production recipe, and required
    for GCY in f32 where theta*(log-w range) exceeds the f32 exponential
    range): solves a small float64 model first, fits an additive
    (ANOVA main-effects) baseline from it, folds it into the operator,
    and warm-starts from it.  ``baseline="loglinear"`` folds the closed
    form instead (adequate for SSY).

    ``polish=True`` (meaningful for float32 / fused solves): after the
    fast solve, refine with float64 Newton warm-started from it — the
    f32 tier's speed with the f64 tier's accuracy.  The polish stage
    runs on the host CPU when the default backend is an accelerator:
    the TPU's "f64" is a float32-range double-float emulation
    (docs/precision.md), while true-f64 CPU Newton from the
    accurate-f32 warm start is ~4 iterations to ~5e-11 residual — at a
    minutes-scale cost at 10^7 points (each inner Krylov matvec is a
    full CPU operator application; NORTHSTAR records the honest
    timing).  ``polish="device"`` runs the f64 stage on the default
    accelerator via that emulation instead — the log-space operator
    stays inside the emulation's float32 range by construction — and
    ``polish="host"`` is the explicit spelling of ``True``.
    """
    space = space or _auto_space()
    gdtype = dtype or jnp.float64
    if algorithm is None:
        algorithm = _default_algorithm(model, kernel)
    if polish:
        import contextlib

        import jax

        stage = _polish_stage(polish)
        fast = wc_ratio_continuous(
            model, grid_sizes, num_std_devs=num_std_devs, method=method,
            interp=interp, quad_degree=quad_degree,
            mc_draw_size=mc_draw_size, seed=seed, algorithm=algorithm,
            tol=max(tol, 1e-4), space=space, w_init=w_init,
            batch_size=batch_size, baseline=baseline, dtype=dtype,
            kernel=kernel, engine=engine, **solver_opts)
        ctx = contextlib.nullcontext()
        if stage == "host" and jax.default_backend() != "cpu":
            ctx = jax.default_device(jax.devices("cpu")[0])
        with ctx:
            # The polish stage reruns the same configuration at float64
            # with interp-engine settings and the Newton-applicable user
            # solver options forwarded (the polish algorithm is always
            # Newton, so e.g. Anderson-history options from an
            # algorithm="anderson" fast stage are dropped); ``baseline``
            # is intentionally dropped too (it exists to keep f32 in
            # range — f64 doesn't need the fold, and skipping it keeps
            # strict reference operator semantics for the final
            # residual).
            return wc_ratio_continuous(
                model, grid_sizes, num_std_devs=num_std_devs, method=method,
                interp=interp, quad_degree=quad_degree,
                mc_draw_size=mc_draw_size, seed=seed, algorithm="newton",
                tol=tol, space="log", batch_size=batch_size, engine=engine,
                w_init=jnp.asarray(np.asarray(fast.w_star), jnp.float64),
                checkpoint_path=checkpoint_path,
                **_newton_applicable(solver_opts))
    # Validate the kernel/method/interp combination BEFORE the coarse
    # baseline's full f64 solve — a config typo must not cost minutes of
    # solve work first.
    if kernel not in ("tiled", "xla"):
        raise ValueError(f"unknown kernel {kernel!r}")
    if kernel == "tiled":
        if method != "quadrature" or space != "log":
            raise ValueError("tiled kernels implement the quadrature "
                             "operators in log space")
        if not isinstance(model, SSY) and interp != "pre":
            raise ValueError(
                "the continuous-GCY pair kernel covers interp='pre' "
                "(factored quadrature); use kernel='xla' for the "
                "post/loglin node-chain engines")
        if interp in ("post", "loglin") and baseline is not None:
            raise ValueError("the post-interp kernel has no baseline "
                             "fold; use interp='pre' for normalized "
                             "operators")
        if interp not in ("pre", "post", "loglin"):
            raise ValueError(f"unknown interp {interp!r}")
    baseline_spec = baseline
    if baseline == "coarse":
        baseline_spec = _coarse_additive_baseline(
            model, grid_sizes, num_std_devs=num_std_devs,
            quad_degree=quad_degree, dtype=gdtype)
    if kernel == "tiled":
        if not isinstance(model, SSY):
            # Continuous GCY: the streamed *pair* configuration — the
            # conditioned z/z_pi expectations contract per-slice in
            # VMEM (kernels/streamed_two_phase.build_c_call_pair).
            # interp="pre" only (validated above); shape constraints
            # (n_z % 128 etc.) are reported by the kernel builder.
            from .kernels.tiled_two_phase import (
                make_tiled_T_log_gcy_continuous)
            grids = build_grid_gcy(model, *grid_sizes,
                                   num_std_devs=num_std_devs)
            T = make_tiled_T_log_gcy_continuous(
                model, grids, degree=quad_degree, baseline=baseline_spec)
        elif interp == "pre":
            grids = build_grid_ssy(model, *grid_sizes,
                                   num_std_devs=num_std_devs)
            from .kernels.tiled_two_phase import (
                make_tiled_T_log_ssy_continuous)
            T = make_tiled_T_log_ssy_continuous(
                model, grids, degree=quad_degree, baseline=baseline_spec)
        elif interp in ("post", "loglin"):
            grids = build_grid_ssy(model, *grid_sizes,
                                   num_std_devs=num_std_devs)
            from .kernels.post_interp_kernel import (
                make_post_interp_kernel_T_ssy)
            T = make_post_interp_kernel_T_ssy(
                model, grids, quad_degree=quad_degree, interp=interp)
        else:
            raise ValueError(f"unknown interp {interp!r}")
        shape = tuple(len(g) for g in grids)
        if w_init is not None:
            w0 = jnp.asarray(w_init, jnp.float32)
        elif hasattr(T, "baseline_log_w"):
            w0 = jnp.exp(T.baseline_log_w)
        else:
            w0 = jnp.ones(shape, jnp.float32)
        sol = _run_solver(T, w0, space, algorithm, tol, solver_opts,
                          theta=model.theta)
        sol = dataclasses.replace(
            sol, grids=tuple(jnp.asarray(g, jnp.float32) for g in grids))
        if checkpoint_path:
            save_solution(checkpoint_path, model, sol.grids, sol.w_star,
                          meta=dict(kind="continuous", method=method,
                                    interp=interp, quad_degree=quad_degree,
                                    num_std_devs=num_std_devs,
                                    algorithm=algorithm, tol=tol,
                                    space=space, kernel="tiled",
                                    iterations=int(sol.result.iterations),
                                    residual=float(sol.result.residual)))
        return sol
    if algorithm in ("fused_anderson", "fused_sa"):
        return _wc_ratio_continuous_fused(
            model, grid_sizes, algorithm=algorithm, tol=tol,
            num_std_devs=num_std_devs, method=method, interp=interp,
            quad_degree=quad_degree, w_init=w_init,
            baseline_spec=baseline_spec,
            checkpoint_path=checkpoint_path, **solver_opts)
    if isinstance(model, SSY):
        grids = build_grid_ssy(model, *grid_sizes, num_std_devs=num_std_devs,
                               dtype=gdtype)
        T = T_ssy_continuous_factory(
            model, grids, method=method, interp=interp, space=space,
            quad_degree=quad_degree, mc_draw_size=mc_draw_size, seed=seed,
            batch_size=batch_size, baseline=baseline_spec, dtype=dtype,
            engine=engine)
    elif isinstance(model, GCY):
        grids = build_grid_gcy(model, *grid_sizes, num_std_devs=num_std_devs,
                               dtype=gdtype)
        T = T_gcy_continuous_factory(
            model, grids, method=method, interp=interp, space=space,
            quad_degree=quad_degree, mc_draw_size=mc_draw_size, seed=seed,
            batch_size=batch_size, baseline=baseline_spec, dtype=dtype)
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")

    shape = tuple(len(g) for g in grids)
    if w_init is None:
        w0 = (jnp.exp(T.baseline_log_w)
              if hasattr(T, "baseline_log_w")
              else jnp.ones(shape, dtype=gdtype))
    else:
        w0 = jnp.asarray(w_init)
    sol = _run_solver(T, w0, space, algorithm, tol, solver_opts,
                          theta=model.theta)
    sol = dataclasses.replace(sol, grids=tuple(grids))
    if checkpoint_path:
        save_solution(checkpoint_path, model, grids, sol.w_star,
                      meta=dict(kind="continuous", method=method,
                                interp=interp, quad_degree=quad_degree,
                                num_std_devs=num_std_devs,
                                algorithm=algorithm, tol=tol, space=space,
                                iterations=int(sol.result.iterations),
                                residual=float(sol.result.residual)))
    return sol


def wc_ratio_sweep(models: Sequence,
                   grid_sizes: Sequence[int],
                   *,
                   num_std_devs: float = 3.2,
                   quad_degree: int = 5,
                   algorithm: str = "newton",
                   tol: float = 1e-7,
                   space: str = "log",
                   w_init=None,
                   dtype=None,
                   **solver_opts):
    """Solve MANY calibrations of one model family in a single compiled
    program — build-operator-and-solve, vmapped over the stacked model
    parameters (and each calibration's own grids).

    The natural consumer of a calibration sweep (e.g. a gamma/psi grid
    for moment matching): one compile covers the whole sweep, and the
    batched program is exactly what the multi-slice (DCN) layout shards
    one-member-per-slice (``parallel/shard_ops`` ``batch_axis``; the
    reference solves calibrations one notebook run at a time).

    Covers the factored quadrature interp="pre" chain (the one operator
    construction that is jnp-traceable end to end over model
    parameters); ``baseline`` folds are not supported in a sweep — the
    log-linear closed form runs a host-side root-find (``brentq``), so
    sweeps run f64 (default) or an explicitly-passed f32 ``dtype`` with
    in-envelope calibrations.

    Returns a :class:`SolveResult` whose fields carry a leading sweep
    axis, plus the stacked ``w_star`` as ``result.x``'s exp when
    ``space="log"`` — as ``(w_star, result, grids_stacked)``.
    """
    import dataclasses as _dc

    import jax

    models = list(models)
    if not models:
        raise ValueError("empty sweep")
    fam = type(models[0])
    if any(type(m) is not fam for m in models):
        raise ValueError("one sweep = one model family; got mixed types")
    if space not in ("w", "log"):
        raise ValueError(f"unknown space {space!r}")
    is_ssy = isinstance(models[0], SSY)
    if is_ssy:
        from .operators.continuous_ssy import _factored_T as _fT
        builder = build_grid_ssy
    else:
        from .operators.continuous_gcy import _factored_T as _fT
        builder = build_grid_gcy
    gdtype = dtype or jnp.float64
    if len(grid_sizes) != (4 if is_ssy else 6):
        raise ValueError(f"grid_sizes must have {4 if is_ssy else 6} "
                         "entries for this family")
    # Per-calibration grids (bounds depend on the parameters), stacked
    # with a leading sweep axis; the vmapped body sees its own grids.
    grids_list = [builder(m, *grid_sizes, num_std_devs=num_std_devs,
                          dtype=gdtype) for m in models]
    grids_stacked = tuple(jnp.stack([g[d] for g in grids_list])
                          for d in range(len(grid_sizes)))
    fields = [f.name for f in _dc.fields(fam)]
    params = {name: jnp.asarray([getattr(m, name) for m in models],
                                gdtype) for name in fields}
    S = len(models)
    shape = tuple(int(s) for s in grid_sizes)
    if w_init is None:
        w0 = jnp.full((S,) + shape, DEFAULT_INIT_W, gdtype)
    else:
        w0 = jnp.asarray(w_init, gdtype)
        if w0.shape == shape:
            w0 = jnp.broadcast_to(w0[None], (S,) + shape)
        elif w0.shape != (S,) + shape:
            raise ValueError(f"w_init shape {w0.shape} matches neither "
                             f"{shape} nor {(S,) + shape}")
    x0 = jnp.log(w0) if space == "log" else w0

    def one(pvec, grids, x0_m):
        m = fam(**{k: pvec[k] for k in fields})
        T = _fT(m, grids, quad_degree, space, gdtype, None)
        return solve(T, x0_m, method=algorithm, tol=tol, jit=False,
                     **solver_opts)

    res = jax.jit(jax.vmap(one))(params, grids_stacked, x0)
    w_star = jnp.exp(res.x) if space == "log" else res.x
    return w_star, res, grids_stacked


# Fields that enter the discrete Koopmans operator only through the
# factor construction (theta, kappa) — differentiable with the
# discretization held fixed.  Dynamics fields (rho_*, s_*, phi_*) shape
# the Rouwenhorst chains themselves (host-side setup) and need the
# continuous path, whose operator construction is traceable end to end.
_PREFERENCE_FIELDS = frozenset({"beta", "gamma", "psi", "mu_c"})


def wc_ratio_differentiable(model,
                            grid_sizes: Sequence[int],
                            *,
                            fields: Sequence[str] = ("beta", "gamma", "psi"),
                            kind: str = "continuous",
                            quad_degree: int = 5,
                            space: str = "log",
                            num_std_devs: float = 3.2,
                            dtype=None,
                            algorithm: str = "newton",
                            tol: float = 1e-7,
                            w_init=None,
                            adjoint_rtol: float = 1e-8,
                            adjoint_maxiter: int = 200,
                            **solver_opts):
    """Build a *differentiable* calibration map ``p -> w*(p)``.

    Returns ``(wc_fn, p0)``: ``p0`` is a dict of the base model's values
    for the named ``fields`` (as jnp scalars), and ``wc_fn(p)`` solves the
    model with those field values substituted and returns the
    W/C ratio field in level space — differentiable in ``p`` through the
    implicit function theorem (:func:`solvers.implicit_fixed_point`), so

        ``jax.grad(lambda p: loss(wc_fn(p)))(p0)``

    prices a calibration gradient at one fixed-point solve plus one
    adjoint Krylov solve, regardless of iteration count.  The reference
    offers nothing comparable — its notebooks re-solve per calibration by
    hand (``code/ssy/continuous_junnan/ssy_test_continuous.md``).

    ``kind="continuous"`` (default) covers the factored quadrature
    ``interp="pre"`` chain — the operator construction that is
    jnp-traceable end to end over model parameters — with grids and
    quadrature nodes FIXED at the base calibration (the sensitivity is of
    collocation values; see the implicit module's docstring), no
    ``baseline`` fold, f64 by default; any model field differentiates.
    ``kind="discrete"`` differentiates through the factored discrete
    operator with the Rouwenhorst discretization held fixed, which is
    exact for the *preference* fields (beta, gamma, psi, mu_c) — dynamics
    fields are rejected there since they reshape the chains themselves.
    """
    import dataclasses as _dc

    from .solvers.implicit import implicit_fixed_point

    fam = type(model)
    is_ssy = isinstance(model, SSY)
    valid = {f.name for f in _dc.fields(fam)}
    bad = [f for f in fields if f not in valid]
    if bad:
        raise ValueError(f"unknown model fields {bad}; valid: {sorted(valid)}")
    if space not in ("w", "log"):
        raise ValueError(f"unknown space {space!r}")
    if kind not in ("continuous", "discrete"):
        raise ValueError(f"unknown kind {kind!r}")
    gdtype = dtype or jnp.float64
    if len(grid_sizes) != (4 if is_ssy else 6):
        raise ValueError(f"grid_sizes must have {4 if is_ssy else 6} "
                         "entries for this family")
    shape = tuple(int(s) for s in grid_sizes)
    w0 = (jnp.full(shape, DEFAULT_INIT_W, gdtype) if w_init is None
          else jnp.asarray(w_init, gdtype).reshape(shape))
    x0 = jnp.log(w0) if space == "log" else w0

    if kind == "discrete":
        non_pref = [f for f in fields if f not in _PREFERENCE_FIELDS]
        if non_pref:
            raise ValueError(
                f"kind='discrete' holds the Rouwenhorst discretization "
                f"fixed, so only preference fields "
                f"{sorted(_PREFERENCE_FIELDS & valid)} differentiate "
                f"exactly; {non_pref} shape the chains themselves — use "
                f"kind='continuous' for dynamics-field gradients")
        if is_ssy:
            disc = discretize_ssy(model, shape)
            factory = T_ssy_factory
        else:
            disc = discretize_gcy(model, shape)
            factory = T_gcy_factory

        def T_of_p(p, x):
            m = _dc.replace(model, **{k: p[k] for k in fields})
            return factory(m, disc, space=space, dtype=gdtype, jit=False)(x)
    else:
        if is_ssy:
            from .operators.continuous_ssy import _factored_T as _fT
            builder = build_grid_ssy
        else:
            from .operators.continuous_gcy import _factored_T as _fT
            builder = build_grid_gcy
        grids = builder(model, *grid_sizes, num_std_devs=num_std_devs,
                        dtype=gdtype)

        def T_of_p(p, x):
            m = _dc.replace(model, **{k: p[k] for k in fields})
            return _fT(m, grids, quad_degree, space, gdtype, None)(x)

    def wc_fn(p):
        x_star = implicit_fixed_point(
            T_of_p, p, x0, method=algorithm, tol=tol,
            adjoint_rtol=adjoint_rtol, adjoint_maxiter=adjoint_maxiter,
            **solver_opts)
        return jnp.exp(x_star) if space == "log" else x_star

    # The grids the returned field is collocated on (continuous kind);
    # downstream moment pipelines must interpolate on THESE, not rebuild
    # their own (calibrate.py).  None for the discrete kind.
    wc_fn.grids = grids if kind == "continuous" else None
    p0 = {f: jnp.asarray(getattr(model, f), gdtype) for f in fields}
    return wc_fn, p0


def prolong_w(w_coarse, grids_coarse, grids_fine):
    """Prolongate a solved w field from coarse grids to finer grids by
    multilinear interpolation (in log space, preserving positivity).

    The workhorse of grid continuation: beta ~ 1 makes cold starts pay
    thousands of contraction-rate iterations to move the *level*; a
    coarse solve captures the level for the cost of a tiny grid, and the
    fine solve then runs a few Newton steps on the shape.
    """
    from .ops.grids import flatten_mesh
    from .ops.interp import lin_interp

    x_fine = flatten_mesh(grids_fine).T                 # (dim, N_fine)
    ell_c = jnp.log(jnp.asarray(w_coarse))
    ell_f = lin_interp(x_fine, ell_c, grids_coarse)
    shape = tuple(len(g) for g in grids_fine)
    return jnp.exp(ell_f).reshape(shape)


def wc_ratio_continuation(model,
                          grid_schedule: Sequence[Sequence[int]],
                          *,
                          algorithm: str = "newton",
                          tol: float = 1e-7,
                          coarse_tol: Optional[float] = None,
                          **kwargs) -> WCSolution:
    """Continuation solve over a schedule of grid sizes.

    Solves the continuous model on ``grid_schedule[0]``, prolongates each
    solution as the next level's warm start, and returns the finest-level
    :class:`WCSolution`.  ``coarse_tol`` (default 100x looser than tol)
    applies to every level but the last.
    """
    if not grid_schedule:
        raise ValueError("empty grid schedule")
    coarse_tol = coarse_tol if coarse_tol is not None else min(1e-4, tol * 100)
    sol = None
    for level, sizes in enumerate(grid_schedule):
        last = level == len(grid_schedule) - 1
        w_init = None
        if sol is not None:
            from .ops.grids import (build_grid_gcy, build_grid_ssy)
            builder = build_grid_ssy if isinstance(model, SSY) else build_grid_gcy
            grids_fine = builder(model, *sizes,
                                 num_std_devs=kwargs.get("num_std_devs", 3.2),
                                 dtype=kwargs.get("dtype") or jnp.float64)
            w_init = prolong_w(sol.w_star, sol.grids, grids_fine)
        sol = wc_ratio_continuous(
            model, sizes, algorithm=algorithm,
            tol=tol if last else coarse_tol, w_init=w_init, **kwargs)
    return sol


def _wc_ratio_continuous_fused(model, grid_sizes, *, algorithm, tol,
                               num_std_devs, method, interp, quad_degree,
                               w_init, checkpoint_path, baseline_spec=None,
                               max_iter: int = 20_000,
                               **solver_opts) -> WCSolution:
    """Whole-solve Pallas kernel path (f32, SSY, quadrature + pre-interp).

    algorithm="fused_anderson" runs the in-kernel Anderson solver;
    "fused_sa" the in-kernel successive-approximation loop.  The entire
    solve executes in one kernel launch with the iterate in VMEM.
    """
    import warnings

    from .kernels.anderson_kernel import make_fused_anderson_ssy_continuous
    from .kernels.solver_kernel import make_fused_solver_ssy_continuous
    from .solvers.result import SolveResult

    if tol < 2e-6:
        warnings.warn(
            f"tol={tol:g} is below the fused kernels' float32 iteration "
            "floor (~1e-5..2e-6 on the log iterate with the accurate "
            "transcendentals, depending on grid size); the solve will stop "
            "at max_iter with the floor residual. Use the f64 XLA Newton "
            "path for tighter tolerances.", stacklevel=3)

    if method != "quadrature" or interp != "pre":
        raise ValueError(
            "fused kernels implement the quadrature + pre-interp operator")
    if isinstance(model, SSY):
        grids = build_grid_ssy(model, *grid_sizes, num_std_devs=num_std_devs,
                               dtype=jnp.float32)
        if algorithm == "fused_anderson":
            fsolve = make_fused_anderson_ssy_continuous(
                model, grids, degree=quad_degree, **solver_opts)
        else:
            fsolve = make_fused_solver_ssy_continuous(
                model, grids, degree=quad_degree, **solver_opts)
    elif isinstance(model, GCY):
        # GCY continuous kernels are baseline-normalized by construction
        # (theta * log-w range ~ 200 on these grids overflows raw f32).
        from .kernels.anderson_kernel import make_fused_anderson_gcy_continuous
        from .kernels.solver_kernel import make_fused_solver_gcy_continuous
        grids = build_grid_gcy(model, *grid_sizes, num_std_devs=num_std_devs,
                               dtype=jnp.float32)
        # The GCY log-linear closed form is ~4.4 log units off at grid
        # corners; theta-folding that into four composed factors overflows
        # f32 (entries ~ e^{theta*4.4}).  Use the coarse additive baseline
        # (baseline="coarse" in the public driver) for production runs.
        gcy_baseline = (baseline_spec if baseline_spec is not None
                        else "loglinear")
        if algorithm == "fused_anderson":
            fsolve = make_fused_anderson_gcy_continuous(
                model, grids, degree=quad_degree, baseline=gcy_baseline,
                **solver_opts)
        else:
            fsolve = make_fused_solver_gcy_continuous(
                model, grids, degree=quad_degree, baseline=gcy_baseline,
                **solver_opts)
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")
    shape = tuple(len(g) for g in grids)
    if w_init is not None:
        w0 = jnp.asarray(w_init, dtype=jnp.float32)
    elif hasattr(fsolve, "baseline_log_w"):
        w0 = jnp.exp(fsolve.baseline_log_w)
    else:
        w0 = jnp.ones(shape, dtype=jnp.float32)
    ell, iters, err = fsolve(jnp.log(w0), tol, max_iter)
    result = SolveResult(x=ell, iterations=iters, residual=err,
                         converged=(err <= tol) & ~jnp.isnan(err))
    sol = WCSolution(w_star=jnp.exp(ell), grids=tuple(grids), result=result,
                     space="log")
    if checkpoint_path:
        save_solution(checkpoint_path, model, grids, sol.w_star,
                      meta=dict(kind="continuous", method=method,
                                interp=interp, quad_degree=quad_degree,
                                num_std_devs=num_std_devs,
                                algorithm=algorithm, tol=tol, space="log",
                                iterations=int(iters),
                                residual=float(err)))
    return sol


def _coarse_additive_baseline(model, grid_sizes, *, num_std_devs,
                              quad_degree, dtype, coarse_size: int = 5,
                              coarse_tol: float = 1e-9):
    """Solve a small float64 model and fit an additive baseline on the
    target grids (profiles interpolated axis-by-axis)."""
    import numpy as np

    from .operators.continuous_common import additive_profiles
    from .ops.grids import build_grid_gcy, build_grid_ssy

    builder = build_grid_ssy if isinstance(model, SSY) else build_grid_gcy
    coarse_sizes = tuple(min(int(s), coarse_size) for s in grid_sizes)
    sol = wc_ratio_continuous(model, coarse_sizes, algorithm="newton",
                              tol=coarse_tol, interp="pre", space="log",
                              quad_degree=quad_degree,
                              num_std_devs=num_std_devs)
    const, profiles = additive_profiles(jnp.log(sol.w_star))
    fine_grids = builder(model, *grid_sizes, num_std_devs=num_std_devs,
                         dtype=dtype)
    profs = [np.interp(np.asarray(fg, np.float64),
                       np.asarray(cg, np.float64), p)
             for fg, cg, p in zip(fine_grids, sol.grids, profiles)]
    return const, profs


# ---------------------------------------------------------------------------
# de Groot alternative specification (companion paper temp.tex:1421-1516)

@dataclasses.dataclass
class DeGrootSolution:
    """Fixed point g* = (V/C)^(1-gamma) of the de Groot aggregator.

    ``log_g_star`` is the canonical storage: theta enters T~ as an
    *outer* power, so g* scales like (O(1))^theta — at the GCY
    calibration (theta ~ -36, h = 1) it lives at e^97..e^124, and wider
    grids can leave float range entirely.  ``g_star`` materializes
    exp(log g*) on demand (docs/math.md §9).
    """
    log_g_star: jnp.ndarray
    grids: Optional[Tuple[jnp.ndarray, ...]]
    result: SolveResult
    space: str

    @property
    def converged(self) -> bool:
        return bool(self.result.converged)

    @property
    def g_star(self) -> jnp.ndarray:
        return jnp.exp(self.log_g_star)


def degroot_fixed_point(model,
                        sizes: Sequence[int],
                        *,
                        kind: str = "discrete",
                        h=None,
                        algorithm: str = "newton",
                        tol: float = 1e-10,
                        space: Optional[str] = None,
                        quad_degree: int = 5,
                        num_std_devs: float = 3.2,
                        discretization: str = "rouwenhorst",
                        g_init_w: float = DEFAULT_INIT_W,
                        sa_warm_tol: float = 1e-6,
                        sa_warm_maxiter: int = 20000,
                        checkpoint_path: Optional[str] = None,
                        **solver_opts) -> DeGrootSolution:
    """End-to-end solve of the de Groot alternative specification.

    Mirrors ``wc_ratio_discrete`` / ``wc_ratio_continuous`` for the
    companion paper's state-dependent-discount family
    (``temp.tex:1421-1516``): build the untilted chain on the
    discretized (``kind="discrete"``) or continuous-quadrature
    (``kind="continuous"``) tier, then solve T~g = g.

    The log space is the default and the supported tier at production
    calibrations (see :class:`DeGrootSolution`); ``algorithm="newton"``
    there runs the validated two-stage recipe — SA to ``sa_warm_tol``
    (the outer map is severely stiff in theta, so cold-start Newton can
    safeguard-stall), then Newton to ``tol``.  ``space="w"`` solves in
    g directly (small-theta / cross-check tier; absolute tolerances only
    make sense when g* is O(1)-scaled, e.g. with a discount margin h<1).

    The initial guess maps the reference's standard w_init = 800 through
    the closed form g = ((1-beta) w)^theta (docs/math.md §9).
    """
    from .operators.degroot import (T_degroot_continuous_factory,
                                    T_degroot_factory)

    space = space or _auto_space()
    theta, beta = model.theta, model.beta
    if kind == "discrete":
        disc = (discretize_ssy if isinstance(model, SSY)
                else discretize_gcy)(model, tuple(sizes),
                                     method=discretization)
        T = T_degroot_factory(model, disc, h=h, space=space)
        grids = None
        shapes = disc.shapes
    elif kind == "continuous":
        builder = build_grid_ssy if isinstance(model, SSY) else build_grid_gcy
        grids = builder(model, *sizes, num_std_devs=num_std_devs)
        T = T_degroot_continuous_factory(model, grids, h=h,
                                         quad_degree=quad_degree,
                                         space=space)
        shapes = tuple(int(len(g)) for g in grids)
    else:
        raise ValueError(f"kind must be 'discrete' or 'continuous', "
                         f"got {kind!r}")

    ell0 = jnp.full(shapes, float(theta) * float(np.log((1.0 - beta)
                                                        * g_init_w)))
    if space == "log":
        x0 = ell0
        if algorithm == "newton":
            pre = solve(T, x0, method="successive_approx", tol=sa_warm_tol,
                        max_iter=sa_warm_maxiter)
            x0 = pre.x
        res = solve(T, x0, method=algorithm, tol=tol, **solver_opts)
        sol = DeGrootSolution(log_g_star=res.x, grids=grids, result=res,
                              space=space)
    else:
        res = solve(T, jnp.exp(ell0), method=algorithm, tol=tol,
                    **solver_opts)
        sol = DeGrootSolution(log_g_star=jnp.log(res.x), grids=grids,
                              result=res, space=space)
    if checkpoint_path:
        # Stored field is ln g* (scale-safe); spec/field markers in meta
        # keep the checkpoint self-describing next to w* checkpoints.
        save_solution(checkpoint_path, model, grids or (), sol.log_g_star,
                      meta=dict(spec="degroot", field="log_g", kind=kind,
                                shapes=list(shapes), algorithm=algorithm,
                                tol=tol, space=space,
                                h=(None if h is None
                                   else np.asarray(h).tolist()),
                                iterations=int(res.iterations),
                                residual=float(res.residual)))
    return sol
