"""Asset pricing from the stochastic discount factor.

The reference stops at the w* callable ("the key input to the SDF",
SURVEY.md §0; the paper's results sections are TODO).  This module takes
the next step the pipeline exists for: conditional SDF expectations and
the risk-free rate,

    r_f(x) = -log E_x[ M' ],

with the expectation over the state shocks taken by Gauss-Hermite
quadrature through the solved w*, and the consumption shock xi
integrated in CLOSED FORM: in

    M' = beta^theta e^{theta h_lam'} g_c^{-gamma} (w'/(w-1))^{theta-1},

only g_c = exp(mu_c + z + sigma_c xi) depends on xi, and xi is
independent of the state innovations, so

    E_x[M'] = exp(-gamma (mu_c + z) + gamma^2 sigma_c^2 / 2)
              * E_states[ beta^theta e^{theta h_lam'}
                          (w'/(w-1))^{theta-1} ]

exactly — one quadrature dimension fewer (degree x fewer w*
interpolations) AND strictly more accurate than quadrating the
lognormal factor.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.gcy import GCY
from ..models.ssy import SSY
from ..operators.continuous_gcy import next_state_gcy
from ..operators.continuous_ssy import next_state_ssy
from ..ops.quadrature import tensor_quadrature_normal
from .simulate import _z_index

__all__ = ["expected_sdf", "risk_free_rate",
           "expected_sdf_ssy", "risk_free_rate_ssy",
           "expected_sdf_gcy", "risk_free_rate_gcy"]


def _family(model):
    if isinstance(model, SSY):
        return next_state_ssy, 4
    if isinstance(model, GCY):
        return next_state_gcy, 6
    raise TypeError(f"unsupported model {type(model).__name__}")


def expected_sdf(model, w_star_func: Callable, degree: int = 5) -> Callable:
    """Build ``x -> E_x[M']`` (both families).

    The state innovations take a degree^dim tensor-product Gauss-Hermite
    rule (dim = 4 for SSY, 6 for GCY); the consumption shock integrates
    in closed form (module docstring).  Returns a jitted callable over a
    single state ``x`` of shape (dim,).
    """
    next_state, dim = _family(model)
    nodes, weights = tensor_quadrature_normal([degree] * dim)
    nodes = jnp.asarray(nodes)          # (dim, Q)
    weights = jnp.asarray(weights)      # (Q,)
    theta, beta, gamma = model.theta, model.beta, model.gamma
    zi = _z_index(model)

    @jax.jit
    def e_sdf(x):
        x = jnp.asarray(x)
        x_next = next_state(model, x[:, None], nodes)           # (dim, Q)
        w_now = w_star_func(x)
        w_next = w_star_func(x_next)                            # (Q,)
        m_states = (beta ** theta * jnp.exp(theta * x_next[0])
                    * (w_next / (w_now - 1.0)) ** (theta - 1.0))
        sigma_c = model.phi_c * jnp.exp(x[1])
        cons = jnp.exp(-gamma * (model.mu_c + x[zi])
                       + 0.5 * gamma ** 2 * sigma_c ** 2)
        return cons * jnp.dot(m_states, weights)

    return e_sdf


def risk_free_rate(model, w_star_func: Callable,
                   degree: int = 5) -> Callable:
    """``x -> r_f(x) = -log E_x[M']`` (per model period)."""
    e_sdf = expected_sdf(model, w_star_func, degree)

    @jax.jit
    def r_f(x):
        return -jnp.log(e_sdf(x))

    return r_f


def expected_sdf_ssy(model: SSY, w_star_func: Callable,
                     degree: int = 5) -> Callable:
    """Family-named alias of :func:`expected_sdf`."""
    return expected_sdf(model, w_star_func, degree)


def risk_free_rate_ssy(model: SSY, w_star_func: Callable,
                       degree: int = 5) -> Callable:
    """Family-named alias of :func:`risk_free_rate`."""
    return risk_free_rate(model, w_star_func, degree)


def expected_sdf_gcy(model: GCY, w_star_func: Callable,
                     degree: int = 3) -> Callable:
    """Family-named alias of :func:`expected_sdf` (GCY default degree 3)."""
    return expected_sdf(model, w_star_func, degree)


def risk_free_rate_gcy(model: GCY, w_star_func: Callable,
                       degree: int = 3) -> Callable:
    """Family-named alias of :func:`risk_free_rate`."""
    return risk_free_rate(model, w_star_func, degree)
