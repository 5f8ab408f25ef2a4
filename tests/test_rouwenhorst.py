"""Rouwenhorst discretization unit tests (theory-anchored oracles)."""

import numpy as np
import pytest
from scipy.special import comb

from sdfs_via_autodiff_tpu.ops.rouwenhorst import (
    rouwenhorst, rouwenhorst_P, rouwenhorst_ladder, stationary_distribution)


@pytest.mark.parametrize("n,rho", [(2, 0.5), (5, 0.987), (10, -0.3), (7, 0.999)])
def test_row_stochastic(n, rho):
    P = rouwenhorst_P(n, rho)
    assert P.shape == (n, n)
    assert np.all(P >= 0)
    np.testing.assert_allclose(P.sum(axis=1), 1.0, rtol=1e-12)


@pytest.mark.parametrize("n,rho", [(3, 0.9), (6, 0.5), (9, 0.99)])
def test_stationary_distribution_is_binomial(n, rho):
    # Known exact result: the symmetric Rouwenhorst chain's stationary
    # distribution is Binomial(n-1, 1/2).
    P = rouwenhorst_P(n, rho)
    pi = stationary_distribution(P)
    binom = np.array([comb(n - 1, k) for k in range(n)]) / 2.0 ** (n - 1)
    np.testing.assert_allclose(pi, binom, atol=1e-10)


@pytest.mark.parametrize("n,rho,sigma", [(5, 0.95, 0.1), (9, 0.5, 1.3)])
def test_stationary_moments_exact(n, rho, sigma):
    # Rouwenhorst matches the AR(1) stationary mean and variance exactly.
    states, P = rouwenhorst(n, rho, sigma)
    pi = stationary_distribution(P)
    mean = pi @ states
    var = pi @ (states - mean) ** 2
    np.testing.assert_allclose(mean, 0.0, atol=1e-12)
    np.testing.assert_allclose(var, sigma**2 / (1 - rho**2), rtol=1e-10)


def test_conditional_first_moment():
    # E[y' | y] = rho * y for the zero-mean chain.
    n, rho, sigma = 7, 0.8, 0.5
    states, P = rouwenhorst(n, rho, sigma)
    np.testing.assert_allclose(P @ states, rho * states, atol=1e-12)


def test_mean_shift():
    # y' = mu + rho*y + sigma*eps has stationary mean mu/(1-rho).
    n, rho, sigma, mu = 5, 0.9, 0.2, 0.05
    states, P = rouwenhorst(n, rho, sigma, mu)
    pi = stationary_distribution(P)
    np.testing.assert_allclose(pi @ states, mu / (1 - rho), rtol=1e-10)
    # Conditional mean: E[y'|y] = mu + rho*y.
    np.testing.assert_allclose(P @ states, mu + rho * states, rtol=1e-10)


def test_ladder_decomposition():
    # states = mu/(1-rho) + sigma * ladder, P independent of (sigma, mu).
    n, rho = 6, 0.7
    ladder = rouwenhorst_ladder(n, rho)
    for sigma, mu in [(0.1, 0.0), (2.0, 0.3)]:
        states, P = rouwenhorst(n, rho, sigma, mu)
        np.testing.assert_allclose(states, mu / (1 - rho) + sigma * ladder,
                                   rtol=1e-12)
        np.testing.assert_allclose(P, rouwenhorst_P(n, rho), rtol=0)


def test_two_state_closed_form():
    # n=2: P = [[p, 1-p], [1-p, p]] with p = (1+rho)/2, states ±sigma/sqrt(1-rho²).
    rho, sigma = 0.6, 0.4
    states, P = rouwenhorst(2, rho, sigma)
    p = (1 + rho) / 2
    np.testing.assert_allclose(P, [[p, 1 - p], [1 - p, p]])
    np.testing.assert_allclose(states,
                               [-sigma / np.sqrt(1 - rho**2),
                                sigma / np.sqrt(1 - rho**2)])
