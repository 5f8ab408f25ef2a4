"""Tauchen discretization tests."""

import numpy as np
import pytest

from sdfs_via_autodiff_tpu.ops.rouwenhorst import stationary_distribution
from sdfs_via_autodiff_tpu.ops.tauchen import tauchen, tauchen_P, tauchen_ladder


@pytest.mark.parametrize("n,rho", [(5, 0.5), (15, 0.9), (21, 0.0)])
def test_row_stochastic(n, rho):
    P = tauchen_P(n, rho)
    assert np.all(P >= 0)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, rtol=1e-12)


def test_moments_approximate():
    # Tauchen is approximate (unlike Rouwenhorst); at moderate rho and a
    # reasonable grid the stationary std should be within a few percent.
    n, rho, sigma = 41, 0.8, 0.5
    states, P = tauchen(n, rho, sigma)
    pi = stationary_distribution(P)
    mean = pi @ states
    std = np.sqrt(pi @ (states - mean) ** 2)
    target = sigma / np.sqrt(1 - rho**2)
    assert abs(mean) < 1e-10
    assert abs(std - target) / target < 0.05


def test_mean_shift():
    n, rho, sigma, mu = 31, 0.7, 0.3, 0.1
    states, P = tauchen(n, rho, sigma, mu)
    pi = stationary_distribution(P)
    np.testing.assert_allclose(pi @ states, mu / (1 - rho), rtol=1e-2)


def test_ladder_decomposition():
    n, rho = 9, 0.6
    ladder = tauchen_ladder(n, rho)
    for sigma, mu in [(0.2, 0.0), (1.5, -0.3)]:
        states, P = tauchen(n, rho, sigma, mu)
        np.testing.assert_allclose(states, mu / (1 - rho) + sigma * ladder,
                                   rtol=1e-12)
        np.testing.assert_allclose(P, tauchen_P(n, rho), rtol=0)


def test_ssy_solve_with_tauchen():
    import jax.numpy as jnp
    from sdfs_via_autodiff_tpu import (SSY, T_ssy_factory, discretize_ssy,
                                       solve)
    model = SSY()
    disc_t = discretize_ssy(model, (4, 4, 4, 6), method="tauchen")
    T = T_ssy_factory(model, disc_t, space="log")
    res = solve(T, jnp.full((4, 4, 4, 6), jnp.log(800.0)), method="newton",
                tol=1e-9)
    assert bool(res.converged)
    # Same order of magnitude as the Rouwenhorst solve at matched shapes
    # (beta~1 amplifies discretization differences in the level; the two
    # methods also span different state ranges at small n).
    disc_r = discretize_ssy(model, (4, 4, 4, 6))
    T_r = T_ssy_factory(model, disc_r, space="log")
    res_r = solve(T_r, jnp.full((4, 4, 4, 6), jnp.log(800.0)),
                  method="newton", tol=1e-9)
    assert 0.1 < float(jnp.exp(res.x).mean() / jnp.exp(res_r.x).mean()) < 10.0


def test_unknown_method_raises():
    from sdfs_via_autodiff_tpu import SSY, discretize_ssy
    with pytest.raises(ValueError):
        discretize_ssy(SSY(), (2, 2, 2, 2), method="nope")
