"""Gauss–Hermite quadrature unit tests."""

import numpy as np
import pytest

from sdfs_via_autodiff_tpu.ops.quadrature import (
    gauss_hermite_normal, tensor_quadrature_normal)


@pytest.mark.parametrize("n", [1, 2, 5, 8, 20])
def test_weights_normalized(n):
    _, w = gauss_hermite_normal(n)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)


def test_standard_normal_moments():
    x, w = gauss_hermite_normal(8)
    # Exact for polynomials up to degree 15.
    np.testing.assert_allclose(w @ x, 0.0, atol=1e-12)
    np.testing.assert_allclose(w @ x**2, 1.0, rtol=1e-12)
    np.testing.assert_allclose(w @ x**4, 3.0, rtol=1e-11)
    np.testing.assert_allclose(w @ x**6, 15.0, rtol=1e-11)


def test_lognormal_mean():
    # E[exp(sZ)] = exp(s^2/2); GH converges fast for this integrand.
    x, w = gauss_hermite_normal(20)
    s = 0.7
    np.testing.assert_allclose(w @ np.exp(s * x), np.exp(s**2 / 2), rtol=1e-10)


def test_tensor_product_layout():
    nodes, weights = tensor_quadrature_normal([3, 4])
    assert nodes.shape == (2, 12)
    assert weights.shape == (12,)
    np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-12)
    # Separable integrand factorizes: E[x0^2 * x1^4] = 1 * 3.
    np.testing.assert_allclose(weights @ (nodes[0] ** 2 * nodes[1] ** 4),
                               3.0, rtol=1e-10)
    # 'ij' ordering: first dim varies slowest.
    x0, _ = gauss_hermite_normal(3)
    np.testing.assert_allclose(nodes[0][:4], np.full(4, x0[0]))


def test_tensor_product_4d_matches_1d():
    nodes, weights = tensor_quadrature_normal([3, 3, 3, 3])
    assert nodes.shape == (4, 81)
    x, w = gauss_hermite_normal(3)
    val = weights @ np.exp(nodes.sum(axis=0))
    np.testing.assert_allclose(val, (w @ np.exp(x)) ** 4, rtol=1e-12)
