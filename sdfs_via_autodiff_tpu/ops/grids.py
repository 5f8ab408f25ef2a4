"""Uniform state-space grids for the continuous-state operators.

Semantics follow the reference grid builders: h-process grids span
``±num_std_devs`` stationary standard deviations centered at zero; the z
grids account for stochastic volatility by using the *maximum* volatility
state (reference ``code/ssy/continuous_junnan/ssy_wc_ratio_continuous.py:20-56``
and ``code/gcy/continuous/gcy_wc_ratio_continuous.py:23-70``).  Grids are
uniform so interpolation coordinates stay affine.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

from ..models.gcy import GCY
from ..models.ssy import SSY

__all__ = ["build_grid_ssy", "build_grid_gcy", "flatten_mesh"]


def _ar1_grid(s: float, rho: float, size: int, num_std: float, dtype) -> jnp.ndarray:
    std = math.sqrt(s**2 / (1 - rho**2))
    g = num_std * std
    return jnp.linspace(-g, g, size, dtype=dtype)


def build_grid_ssy(model: SSY,
                   h_lam_grid_size: int,
                   h_c_grid_size: int,
                   h_z_grid_size: int,
                   z_grid_size: int,
                   num_std_devs: float = 3.2,
                   dtype=jnp.float64,
                   ) -> Tuple[jnp.ndarray, ...]:
    """Grids (h_lam, h_c, h_z, z) for SSY continuous interpolation.

    z spans ``±num_std_devs * sigma_z_max`` where ``sigma_z_max`` uses the
    maximal h_z grid point (reference ``ssy_wc_ratio_continuous.py:49-55``).
    """
    m = model
    h_lam_grid = _ar1_grid(m.s_lam, m.rho_lam, h_lam_grid_size, num_std_devs, dtype)
    h_c_grid = _ar1_grid(m.s_c, m.rho_c, h_c_grid_size, num_std_devs, dtype)
    h_z_grid = _ar1_grid(m.s_z, m.rho_z, h_z_grid_size, num_std_devs, dtype)

    h_z_max = num_std_devs * math.sqrt(m.s_z**2 / (1 - m.rho_z**2))
    sigma_z_max = m.phi_z * math.exp(h_z_max)
    z_max = num_std_devs * sigma_z_max
    z_grid = jnp.linspace(-z_max, z_max, z_grid_size, dtype=dtype)
    return h_lam_grid, h_c_grid, h_z_grid, z_grid


def build_grid_gcy(model: GCY,
                   h_lam_grid_size: int,
                   h_c_grid_size: int,
                   h_z_grid_size: int,
                   h_zpi_grid_size: int,
                   z_grid_size: int,
                   z_pi_grid_size: int,
                   num_std_devs: float = 3.2,
                   dtype=jnp.float64,
                   ) -> Tuple[jnp.ndarray, ...]:
    """Grids (h_lam, h_c, h_z, h_zpi, z, z_pi) for GCY continuous
    interpolation; the z bounds fold in the rho_pi * z_pi feedback
    (reference ``gcy_wc_ratio_continuous.py:56-70``)."""
    m = model
    h_lam_grid = _ar1_grid(m.s_lam, m.rho_lam, h_lam_grid_size, num_std_devs, dtype)
    h_c_grid = _ar1_grid(m.s_c, m.rho_c, h_c_grid_size, num_std_devs, dtype)
    h_z_grid = _ar1_grid(m.s_z, m.rho_z, h_z_grid_size, num_std_devs, dtype)
    h_zpi_grid = _ar1_grid(m.s_zpi, m.rho_zpi, h_zpi_grid_size, num_std_devs, dtype)

    h_zpi_max = num_std_devs * math.sqrt(m.s_zpi**2 / (1 - m.rho_zpi**2))
    sigma_zpi_max = m.phi_zpi * math.exp(h_zpi_max)
    zpi_max = num_std_devs * math.sqrt(sigma_zpi_max**2 / (1 - m.rho_pipi**2))
    z_pi_grid = jnp.linspace(-zpi_max, zpi_max, z_pi_grid_size, dtype=dtype)

    h_z_max = num_std_devs * math.sqrt(m.s_z**2 / (1 - m.rho_z**2))
    sigma_z_max = m.phi_z * math.exp(h_z_max)
    z_hi = (m.rho_pi * float(z_pi_grid[-1]) + num_std_devs * sigma_z_max) / (1 - m.rho)
    z_lo = (m.rho_pi * float(z_pi_grid[0]) - num_std_devs * sigma_z_max) / (1 - m.rho)
    z_grid = jnp.linspace(z_lo, z_hi, z_grid_size, dtype=dtype)
    return h_lam_grid, h_c_grid, h_z_grid, h_zpi_grid, z_grid, z_pi_grid


def flatten_mesh(grids: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Cartesian product of 1-D grids as a (N, dim) array in 'ij' order.

    The row for multi-index (i1, ..., id) sits at the flattened C-order
    position, so ``values.reshape(shape)`` inverts the flattening.
    """
    mesh = jnp.meshgrid(*grids, indexing="ij")
    return jnp.stack([g.ravel() for g in mesh], axis=1)
