"""State-path simulation and simulated moments of the W/C ratio.

The reference validates solutions by simulating a 10^6-step state path,
evaluating interpolated w* along it, and tabulating mean/std (reference
``code/ssy/continuous_junnan/test_newton.md:198-238``; BASELINE.md records
the published E[w]/sigma[w] anchors).  Here the simulation is a
device-resident ``lax.scan`` over the model's ``next_state``, and the SDF
itself (Epstein–Zin with theta-exponents, built from w*) is exposed for
downstream pricing.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..models.gcy import GCY
from ..models.ssy import SSY
from ..operators.continuous_gcy import next_state_gcy
from ..operators.continuous_ssy import next_state_ssy

__all__ = ["simulate_states", "simulated_w_moments", "one_step_w_moments",
           "sdf_factory", "sdf_factory_ssy", "sdf_factory_gcy"]


def _next_state_for(model):
    if isinstance(model, SSY):
        return lambda x, s: next_state_ssy(model, x, s), 4
    if isinstance(model, GCY):
        return lambda x, s: next_state_gcy(model, x, s), 6
    raise TypeError(f"unsupported model {type(model).__name__}")


def simulate_states(model, num_steps: int, *, seed: int = 1234,
                    x0=None, dtype=jnp.float64) -> jnp.ndarray:
    """Simulate a path of the model's state vector.

    Returns an array of shape (dim, num_steps).  A device-resident
    ``lax.scan`` replaces the reference's Python loop over ``next_state``
    (``test_newton.md:202-208``).
    """
    step, dim = _next_state_for(model)
    key = jax.random.PRNGKey(seed)
    shocks = jax.random.normal(key, (num_steps, dim, 1), dtype=dtype)
    x_init = (jnp.zeros((dim, 1), dtype=dtype) if x0 is None
              else jnp.asarray(x0, dtype=dtype).reshape(dim, 1))

    def body(x, eps):
        x_new = step(x, eps)
        return x_new, x_new

    _, path = jax.lax.scan(body, x_init, shocks)
    return path[:, :, 0].T            # (dim, num_steps)


def simulated_w_moments(model, w_star_func: Callable, num_steps: int = 1_000_000,
                        *, seed: int = 1234, burn_in: int = 1000
                        ) -> Tuple[float, float]:
    """Mean and standard deviation of w* along a simulated state path
    (the reference's validation metric, ``test_newton.md:210-215``)."""
    path = simulate_states(model, num_steps + burn_in, seed=seed)
    w = w_star_func(path[:, burn_in:])
    return float(jnp.mean(w)), float(jnp.std(w))


def one_step_w_moments(model, w_star_func: Callable,
                       num_draws: int = 1_000_000, *, seed: int = 1234,
                       x0=None) -> Tuple[float, float]:
    """Mean/std of w* over the one-step-ahead state distribution from x0.

    This is the exact methodology behind the reference's tabulated
    "simulated" E[w], sigma[w] anchors (reference ``test_newton.md:
    198-215``): one ``next_state`` step from the origin with 10^6 draws
    under ``PRNGKey(seed)``, then interpolate w* at those states.
    """
    step, dim = _next_state_for(model)
    key = jax.random.PRNGKey(seed)
    draws = jax.random.normal(key, (dim, num_draws))
    x0 = jnp.zeros(dim) if x0 is None else jnp.asarray(x0)
    x_next = step(x0, draws)
    w = w_star_func(x_next)
    return float(jnp.mean(w)), float(jnp.std(w))


def _z_index(model) -> int:
    """Index of the persistent growth state z in the continuous state
    layout: SSY (h_lam, h_c, h_z, z) -> 3; GCY (h_lam, h_c, h_z, h_zpi,
    z, z_pi) -> 4.  Both families read sigma_c = phi_c*exp(h_c) from
    index 1 and the next preference shock h_lam' from index 0."""
    if isinstance(model, SSY):
        return 3
    if isinstance(model, GCY):
        return 4
    raise TypeError(f"unsupported model {type(model).__name__}")


def sdf_factory(model, w_star_func: Callable) -> Callable:
    """Epstein–Zin stochastic discount factor (both families).

    From the model's Euler equation (reference ``paper/autosdfs.tex:
    376-384``), with preference-shock ratio lambda'/lambda = exp(h_lam'):

        M' = beta^theta * exp(theta*h_lam') * (g_c')^(-gamma)
             * ( w(x') / (w(x) - 1) )^(theta - 1)

    where g_c' = exp(mu_c + z + sigma_c*xi') is consumption growth out
    of the current state (sigma_c = phi_c*exp(h_c), matching the kappa
    the operators use — reference ``gcy_wc_ratio_continuous.py:
    135-136``) and w the wealth-consumption ratio.  Returns
    ``m(x, x_next, xi)`` evaluating the SDF along a transition; only
    the z index differs across families (:func:`_z_index`).
    """
    theta, beta, gamma = model.theta, model.beta, model.gamma
    zi = _z_index(model)

    def sdf(x, x_next, xi):
        z = x[zi]
        sigma_c = model.phi_c * jnp.exp(x[1])
        g_c = jnp.exp(model.mu_c + z + sigma_c * xi)
        w_now = w_star_func(x)
        w_next = w_star_func(x_next)
        return (beta ** theta * jnp.exp(theta * x_next[0])
                * g_c ** (-gamma)
                * (w_next / (w_now - 1.0)) ** (theta - 1.0))

    return sdf


def sdf_factory_ssy(model: SSY, w_star_func: Callable) -> Callable:
    """Family-named alias of :func:`sdf_factory`."""
    return sdf_factory(model, w_star_func)


def sdf_factory_gcy(model: GCY, w_star_func: Callable) -> Callable:
    """Family-named alias of :func:`sdf_factory`."""
    return sdf_factory(model, w_star_func)
