"""Continuous-state Koopmans operator for the GCY model.

State grids (h_lam, h_c, h_z, h_zpi, z, z_pi) — the axis order of the
reference continuous layer (``code/gcy/continuous/gcy_wc_ratio_continuous.py:
20-21``, which differs from the discrete layer's order).  Parity targets:
``next_state`` (:77-115), ``Kg_vmap_mc``/``Kg_vmap_quad`` (:122-187),
``T_fun_factory`` (:190-261).

Same three interpolation spaces and the log-space option as the SSY
continuous operator; quadrature + interp="pre" runs as a factored chain of
per-axis contractions with conditional expectation matrices for z
(conditioning on h_z and z_pi) and z_pi (conditioning on h_zpi).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.gcy import GCY
from ..ops.grids import build_grid_gcy
from ..ops.quadrature import gauss_hermite_normal, tensor_quadrature_normal
from .continuous_common import expectation_matrix, make_gather_T

__all__ = ["next_state_gcy", "T_gcy_continuous_factory", "build_grid_gcy"]


def next_state_gcy(model: GCY, x: jnp.ndarray, shocks: jnp.ndarray) -> jnp.ndarray:
    """One step of the six GCY state processes.

    ``x`` has leading axis (h_lam, h_c, h_z, h_zpi, z, z_pi); ``shocks`` is
    (6, N).  Parity: reference ``next_state``
    (``gcy_wc_ratio_continuous.py:77-115``).
    """
    m = model
    h_lam, h_c, h_z, h_zpi, z, z_pi = (x[i] for i in range(6))
    sigma_z = m.phi_z * jnp.exp(h_z)
    sigma_zpi = m.phi_zpi * jnp.exp(h_zpi)
    return jnp.stack([
        m.rho_lam * h_lam + m.s_lam * shocks[0],
        m.rho_c * h_c + m.s_c * shocks[1],
        m.rho_z * h_z + m.s_z * shocks[2],
        m.rho_zpi * h_zpi + m.s_zpi * shocks[3],
        m.rho * z + m.rho_pi * z_pi + sigma_z * shocks[4],
        m.rho_pipi * z_pi + sigma_zpi * shocks[5],
    ])


def _log_kappa_gcy(model: GCY, h_c, z):
    """log kappa = (1-gamma)(mu_c+z) + (1/2)(1-gamma)^2 sigma_c^2 with
    sigma_c = phi_c*exp(h_c) (reference ``gcy_wc_ratio_continuous.py:
    135-136``)."""
    sigma_c = model.phi_c * jnp.exp(h_c)
    return ((1 - model.gamma) * (model.mu_c + z)
            + 0.5 * (1 - model.gamma) ** 2 * sigma_c ** 2)


def _factored_T(model, grids, degree, space, dtype):
    """Factored contraction operator (quadrature + interp="pre").

    Axis labels: l=h_lam, k=h_c, i=h_z, y=h_zpi, j=z, b=z_pi; capitals are
    next-period indices.  The z_pi contraction runs *before* the z
    contraction so intermediates stay O(N) despite z' conditioning on the
    current z_pi.
    """
    beta, theta = model.beta, model.theta
    m = model
    h_lam_grid, h_c_grid, h_z_grid, h_zpi_grid, z_grid, z_pi_grid = grids
    eta, omega = map(jnp.asarray, gauss_hermite_normal(degree))

    P_lam = expectation_matrix(h_lam_grid, m.rho_lam * h_lam_grid, m.s_lam,
                               eta, omega,
                               payoff=lambda xn: jnp.exp(theta * xn))
    P_c = expectation_matrix(h_c_grid, m.rho_c * h_c_grid, m.s_c, eta, omega)
    P_hz = expectation_matrix(h_z_grid, m.rho_z * h_z_grid, m.s_z, eta, omega)
    P_hzpi = expectation_matrix(h_zpi_grid, m.rho_zpi * h_zpi_grid, m.s_zpi,
                                eta, omega)
    sigma_z = m.phi_z * jnp.exp(h_z_grid)          # (i,)
    sigma_zpi = m.phi_zpi * jnp.exp(h_zpi_grid)    # (y,)
    # z_pi' = rho_pipi*z_pi + sigma_zpi(h_zpi)*eta: P_zpi[y, b, B]
    P_zpi = expectation_matrix(
        z_pi_grid,
        jnp.broadcast_to(m.rho_pipi * z_pi_grid,
                         (len(h_zpi_grid), len(z_pi_grid))),
        sigma_zpi[:, None], eta, omega)
    # z' = rho*z + rho_pi*z_pi + sigma_z(h_z)*eta: P_z[i, j, b, J]
    mean_z = (m.rho * z_grid[None, :, None]
              + m.rho_pi * z_pi_grid[None, None, :])
    mean_z = jnp.broadcast_to(mean_z, (len(h_z_grid), len(z_grid),
                                       len(z_pi_grid)))
    P_z = expectation_matrix(z_grid, mean_z, sigma_z[:, None, None],
                             eta, omega)
    log_kappa = _log_kappa_gcy(m, h_c_grid[:, None], z_grid[None, :])  # (k, j)

    if dtype is not None:
        (P_lam, P_c, P_hz, P_hzpi, P_zpi, P_z, log_kappa) = (
            a.astype(dtype) for a in
            (P_lam, P_c, P_hz, P_hzpi, P_zpi, P_z, log_kappa))

    def apply_K(g):
        u = jnp.einsum("lL,LKIYJB->lKIYJB", P_lam, g)
        u = jnp.einsum("kK,lKIYJB->lkIYJB", P_c, u)
        u = jnp.einsum("iI,lkIYJB->lkiYJB", P_hz, u)
        u = jnp.einsum("yY,lkiYJB->lkiyJB", P_hzpi, u)
        u = jnp.einsum("ybB,lkiyJB->lkiyJb", P_zpi, u)   # next-z_pi first
        u = jnp.einsum("ijbJ,lkiyJb->lkiyjb", P_z, u)    # then next-z
        return u

    expand = (None, slice(None), None, None, slice(None), None)  # (k, j)

    if space == "w":
        kappa = jnp.exp(log_kappa)

        def T(w):
            kg = kappa[expand] * apply_K(w ** theta)
            return 1.0 + beta * kg ** (1.0 / theta)
    else:
        from ..ops.contract import lse_matmul

        def T(ell):
            a = theta * ell
            a = lse_matmul(P_lam, a, "lL,LKIYJB->lKIYJB", 0)
            a = lse_matmul(P_c, a, "kK,lKIYJB->lkIYJB", 1)
            a = lse_matmul(P_hz, a, "iI,lkIYJB->lkiYJB", 2)
            a = lse_matmul(P_hzpi, a, "yY,lkiYJB->lkiyJB", 3)
            a = lse_matmul(P_zpi, a, "ybB,lkiyJB->lkiyJb", 5)
            a = lse_matmul(P_z, a, "ijbJ,lkiyJb->lkiyjb", 4)
            log_kg = a + log_kappa[expand]
            return jnp.log1p(beta * jnp.exp(log_kg / theta))

    return T


def T_gcy_continuous_factory(model: GCY,
                             grids: Sequence[jnp.ndarray],
                             *,
                             method: str = "quadrature",
                             interp: str = "pre",
                             space: str = "w",
                             quad_degree: int = 5,
                             mc_draw_size: int = 2000,
                             seed: int = 1234,
                             batch_size: Optional[int] = None,
                             dtype=None,
                             jit: bool = True) -> Callable:
    """Build the continuous-state GCY operator T (see the SSY twin for the
    method/interp/space semantics)."""
    if space not in ("w", "log"):
        raise ValueError(f"unknown space {space!r}")
    if space == "log":
        from ..models.gcy import gcy_loglinear_factory
        from .continuous_common import warn_if_f32_range_unsafe
        warn_if_f32_range_unsafe(model, grids, gcy_loglinear_factory,
                                 dtype or jnp.float64)
    if method == "quadrature" and interp == "pre":
        T = _factored_T(model, grids, quad_degree, space, dtype)
    elif method in ("quadrature", "monte_carlo"):
        if method == "quadrature":
            nodes, weights = tensor_quadrature_normal([quad_degree] * 6)
            shocks, weights = jnp.asarray(nodes), jnp.asarray(weights)
        else:
            key = jax.random.PRNGKey(seed)
            shocks = jax.random.normal(key, (6, mc_draw_size),
                                       dtype=jnp.result_type(grids[0]))
            weights = None
        T = make_gather_T(
            lambda x, s: next_state_gcy(model, x, s),
            lambda x: _log_kappa_gcy(model, x[1], x[4]),
            grids, shocks, weights, interp, space, batch_size,
            model.beta, model.theta)
    else:
        raise ValueError(f"unknown method {method!r}")
    return jax.jit(T) if jit else T
