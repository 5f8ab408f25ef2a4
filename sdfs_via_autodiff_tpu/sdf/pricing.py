"""Asset pricing from the stochastic discount factor.

The reference stops at the w* callable ("the key input to the SDF",
SURVEY.md §0; the paper's results sections are TODO).  This module takes
the next step the pipeline exists for: conditional SDF expectations and
the risk-free rate,

    r_f(x) = -log E_x[ M' ],

with the expectation over the state shocks and the consumption shock
taken by Gauss-Hermite quadrature through the solved w*.
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
from .simulate import sdf_factory_gcy, sdf_factory_ssy

__all__ = ["expected_sdf_ssy", "risk_free_rate_ssy",
           "expected_sdf_gcy", "risk_free_rate_gcy"]


def expected_sdf_ssy(model: SSY, w_star_func: Callable,
                     degree: int = 5) -> Callable:
    """Build ``x -> E_x[M']`` for the SSY model.

    The five shocks (four state innovations + the consumption shock xi)
    are independent standard normals; the expectation is a degree^5
    tensor-product Gauss-Hermite rule.  Returns a jitted callable over a
    single state ``x`` of shape (4,).
    """
    nodes, weights = tensor_quadrature_normal([degree] * 5)
    nodes = jnp.asarray(nodes)          # (5, Q)
    weights = jnp.asarray(weights)      # (Q,)
    sdf = sdf_factory_ssy(model, w_star_func)

    @jax.jit
    def e_sdf(x):
        x = jnp.asarray(x)
        x_next = next_state_ssy(model, x[:, None], nodes[:4])   # (4, Q)
        m_vals = sdf(x[:, None], x_next, nodes[4])              # (Q,)
        return jnp.dot(m_vals, weights)

    return e_sdf


def risk_free_rate_ssy(model: SSY, w_star_func: Callable,
                       degree: int = 5) -> Callable:
    """``x -> r_f(x) = -log E_x[M']`` (per model period)."""
    e_sdf = expected_sdf_ssy(model, w_star_func, degree)

    @jax.jit
    def r_f(x):
        return -jnp.log(e_sdf(x))

    return r_f


def expected_sdf_gcy(model: GCY, w_star_func: Callable,
                     degree: int = 3) -> Callable:
    """``x -> E_x[M']`` for GCY (six state shocks + xi: a degree^7 rule)."""
    nodes, weights = tensor_quadrature_normal([degree] * 7)
    nodes = jnp.asarray(nodes)
    weights = jnp.asarray(weights)
    sdf = sdf_factory_gcy(model, w_star_func)

    @jax.jit
    def e_sdf(x):
        x = jnp.asarray(x)
        x_next = next_state_gcy(model, x[:, None], nodes[:6])
        m_vals = sdf(x[:, None], x_next, nodes[6])
        return jnp.dot(m_vals, weights)

    return e_sdf


def risk_free_rate_gcy(model: GCY, w_star_func: Callable,
                       degree: int = 3) -> Callable:
    """``x -> r_f(x) = -log E_x[M']`` for GCY."""
    e_sdf = expected_sdf_gcy(model, w_star_func, degree)

    @jax.jit
    def r_f(x):
        return -jnp.log(e_sdf(x))

    return r_f
