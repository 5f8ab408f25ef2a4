"""Moment-matching calibration on implicit-function-theorem gradients.

The reference's validation anchors are simulated moments of w* — E[w],
sigma[w] over the one-step-ahead state distribution from the origin
(``/root/reference/code/ssy/continuous_junnan/test_newton.md:198-215``) —
and its calibration workflow is "re-run the notebook with new
parameters".  With w*(p) differentiable through the fixed point
(:mod:`solvers.implicit`, docs/math.md §8), moment matching becomes a
smooth least-squares problem:

    min_p  || moments(w*(p)) - targets ||^2

solved here by damped Gauss-Newton (Levenberg-Marquardt), where each
Jacobian row is one reverse-mode pass = one adjoint Krylov solve.  The
moment pipeline is differentiable end to end: solve -> multilinear
interpolation of w* at the one-step-ahead states -> mean/std, with the
``next_state`` step itself re-traced over ``p`` so dynamics-field
calibrations (continuous kind) move the simulated states too.

Forward-mode Jacobians are deliberately not used: the implicit solve is
a ``jax.custom_vjp`` (reverse only), and with <= a handful of moments
reverse mode is also the cheaper direction.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .drivers import wc_ratio_differentiable
from .models.ssy import SSY
from .ops.interp import lin_interp

__all__ = ["calibrate_moments", "one_step_moments_differentiable"]


def _next_state_fn(model):
    if isinstance(model, SSY):
        from .operators.continuous_ssy import next_state_ssy
        return next_state_ssy, 4
    from .operators.continuous_gcy import next_state_gcy
    return next_state_gcy, 6


def one_step_moments_differentiable(model, grids, w_grid, draws,
                                    overrides: Optional[Dict] = None):
    """(E[w], sigma[w]) over the one-step-ahead distribution from the
    origin — the reference's tabulated anchor methodology — as a jnp pair
    differentiable in both the field values ``w_grid`` and the model
    ``overrides`` (the state step is re-traced over them).
    """
    m = (dataclasses.replace(model, **overrides) if overrides else model)
    step, dim = _next_state_fn(m)
    x0 = jnp.zeros(dim, dtype=draws.dtype)
    x_next = step(m, x0, draws)            # (dim, n_draws)
    w = lin_interp(x_next, w_grid, grids)
    return jnp.mean(w), jnp.std(w)


def calibrate_moments(model,
                      grid_sizes: Sequence[int],
                      targets: Dict[str, float],
                      *,
                      fields: Sequence[str] = ("beta", "gamma"),
                      kind: str = "continuous",
                      num_draws: int = 50_000,
                      seed: int = 1234,
                      max_steps: int = 20,
                      rtol: float = 1e-8,
                      xtol: float = 1e-10,
                      init_damping: float = 1e-6,
                      verbose: bool = False,
                      **diff_opts):
    """Calibrate the named model ``fields`` so the one-step simulated
    moments of w* hit ``targets`` (keys among ``{"mean", "std"}``).

    Damped Gauss-Newton on the normalized residuals: each iteration costs
    one fixed-point solve per damping trial (which also yields the next
    residual) plus ``len(targets)`` adjoint Krylov solves for the
    Jacobian — the ``jax.vjp`` pullback is held from the accepted point,
    so no primal solve is ever repeated.
    Returns ``(calibrated_model, info)`` where ``info`` carries the
    residual/parameter history and convergence flag.

    Continuous kind only (the anchor methodology interpolates a
    continuous field).  The solve grids stay at the base calibration
    (IFT collocation convention) while the moment pipeline's state step
    DOES move with dynamics-field updates.
    """
    for k in targets:
        if k not in ("mean", "std"):
            raise ValueError(f"unknown target {k!r} (want mean/std)")
    if not targets:
        raise ValueError("empty targets")
    if len(targets) > len(fields):
        raise ValueError(f"{len(targets)} targets need >= that many "
                         f"fields; got {list(fields)}")
    if kind != "continuous":
        # The one-step moment methodology interpolates a continuous field
        # (the reference's anchors are continuous-model moments); the
        # discrete Rouwenhorst z-ladders are state-dependent, not a
        # tensor-product grid, so multilinear interpolation over them is
        # ill-posed.
        raise ValueError("calibrate_moments requires kind='continuous'")

    wc_fn, p0 = wc_ratio_differentiable(model, grid_sizes, fields=fields,
                                        kind=kind, **diff_opts)
    _, dim = _next_state_fn(model)
    key = jax.random.PRNGKey(seed)
    draws = jax.random.normal(key, (dim, num_draws), dtype=jnp.float64)
    # Interpolate on the exact grids the differentiable solve collocates
    # on (no rebuild — a drifting num_std_devs default would silently
    # skew the interpolated moments).
    grids = wc_fn.grids

    names = list(fields)
    keys_t = [k for k in ("mean", "std") if k in targets]
    tvec = np.array([targets[k] for k in keys_t])
    scale = np.maximum(1.0, np.abs(tvec))

    def residual(pvec):
        p = {n: pvec[i] for i, n in enumerate(names)}
        w_grid = wc_fn(p)
        mu, sd = one_step_moments_differentiable(model, grids, w_grid,
                                                 draws, overrides=p)
        vals = {"mean": mu, "std": sd}
        return jnp.stack([(vals[k] - targets[k]) / s
                          for k, s in zip(keys_t, scale)])

    pvec = jnp.asarray([float(p0[n]) for n in names])
    # One jax.vjp per primal point gives BOTH the residual value and the
    # Jacobian pullback — each Jacobian row is then one adjoint Krylov
    # solve with NO redundant fixed-point re-solve (jacrev would re-run
    # the primal solve the accept step already paid for).
    r, r_pullback = jax.vjp(residual, pvec)
    n_t = len(keys_t)

    def jac_rows(pullback):
        eye = np.eye(n_t)
        return np.stack([np.asarray(pullback(jnp.asarray(eye[k]))[0])
                         for k in range(n_t)])

    cost = float(jnp.sum(r ** 2))
    lam = init_damping
    history = [dict(step=0, cost=cost, accepted=True,
                    p={n: float(v) for n, v in zip(names, pvec)})]
    converged = cost <= rtol ** 2
    for it in range(1, max_steps + 1):
        if converged:
            break
        J = jac_rows(r_pullback)
        rn = np.asarray(r)
        accepted = False
        for _ in range(8):                       # LM damping adaptation
            A = J.T @ J + lam * np.eye(len(names))
            dp = -np.linalg.solve(A, J.T @ rn)
            cand = pvec + jnp.asarray(dp)
            r_new, pb_new = jax.vjp(residual, cand)
            cost_new = float(jnp.sum(r_new ** 2))
            if np.isfinite(cost_new) and cost_new < cost:
                pvec, r, r_pullback, cost = cand, r_new, pb_new, cost_new
                lam = max(lam / 4.0, 1e-12)
                accepted = True
                break
            lam *= 8.0
        history.append(dict(step=it, cost=cost, accepted=accepted,
                            p={n: float(v) for n, v in zip(names, pvec)}))
        if verbose:
            print(f"[calibrate] step {it}: cost {cost:.3e} lam {lam:.1e}")
        if not accepted:
            break
        if cost <= rtol ** 2 or float(np.linalg.norm(dp)) <= \
                xtol * (1.0 + float(jnp.linalg.norm(pvec))):
            converged = True

    calibrated = dataclasses.replace(
        model, **{n: float(v) for n, v in zip(names, pvec)})
    info = dict(converged=bool(converged), cost=cost,
                steps=sum(1 for hh in history[1:] if hh["accepted"]),
                history=history)
    return calibrated, info
