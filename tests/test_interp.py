"""Multilinear interpolation unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu.ops.interp import (
    lin_interp, multilinear_interp, uniform_grid_coords)


def _grids(sizes, lows, highs):
    return [jnp.linspace(lo, hi, n) for n, lo, hi in zip(sizes, lows, highs)]


def test_coords_affine():
    grids = _grids([5, 9], [-1.0, 0.0], [1.0, 4.0])
    x = jnp.array([[-1.0, 0.0, 1.0], [0.0, 2.0, 4.0]])
    coords = uniform_grid_coords(grids, x)
    np.testing.assert_allclose(coords, [[0, 2, 4], [0, 4, 8]], atol=1e-12)


def test_exact_on_grid_points(rng):
    grids = _grids([4, 5, 6], [-1, -2, 0], [1, 2, 3])
    vals = jnp.asarray(rng.standard_normal((4, 5, 6)))
    mesh = jnp.meshgrid(*grids, indexing="ij")
    x = jnp.stack([g.ravel() for g in mesh], axis=0)
    out = lin_interp(x, vals, grids)
    np.testing.assert_allclose(out, np.asarray(vals).ravel(), atol=1e-12)


def test_exact_on_multilinear_function(rng):
    # f(x) = 2 + x0 - 3*x1 + 0.5*x0*x1 is reproduced exactly by bilinear
    # interpolation at arbitrary interior points.
    grids = _grids([7, 8], [-1, -1], [1, 1])
    g0, g1 = jnp.meshgrid(*grids, indexing="ij")
    vals = 2 + g0 - 3 * g1 + 0.5 * g0 * g1
    x = jnp.asarray(rng.uniform(-1, 1, size=(2, 50)))
    out = lin_interp(x, vals, grids)
    expected = 2 + x[0] - 3 * x[1] + 0.5 * x[0] * x[1]
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_clamps_at_edges():
    grids = _grids([5], [0.0], [1.0])
    vals = jnp.asarray([10.0, 1.0, 2.0, 3.0, 40.0])
    x = jnp.array([[-5.0, 0.0, 1.0, 7.0]])
    out = multilinear_interp(vals, uniform_grid_coords(grids, x))
    np.testing.assert_allclose(out, [10.0, 10.0, 40.0, 40.0], atol=1e-12)


def test_matches_jax_map_coordinates(rng):
    # Cross-check against the implementation the reference relied on
    # (reference code/utils.py:17-23).
    try:
        from jax.scipy.ndimage import map_coordinates
    except ImportError:
        pytest.skip("jax.scipy.ndimage not available")
    grids = _grids([6, 7, 5, 8], [-1, 0, -2, 1], [1, 3, 0, 2])
    vals = jnp.asarray(rng.standard_normal((6, 7, 5, 8)))
    x = jnp.stack([
        jnp.asarray(rng.uniform(-1.5, 1.5, 200)),
        jnp.asarray(rng.uniform(-0.5, 3.5, 200)),
        jnp.asarray(rng.uniform(-2.5, 0.5, 200)),
        jnp.asarray(rng.uniform(0.5, 2.5, 200)),
    ])
    coords = uniform_grid_coords(grids, x)
    ours = multilinear_interp(vals, coords)
    theirs = map_coordinates(vals, list(coords), order=1, mode="nearest")
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_grad_flows(rng):
    import jax
    grids = _grids([5, 5], [0, 0], [1, 1])
    vals = jnp.asarray(rng.standard_normal((5, 5)))

    def f(v):
        x = jnp.array([[0.3, 0.7], [0.2, 0.9]])
        return jnp.sum(lin_interp(x, v, grids))

    g = jax.grad(f)(vals)
    assert np.isfinite(np.asarray(g)).all()
    # Interpolation weights sum to one per query point.
    np.testing.assert_allclose(np.asarray(g).sum(), 2.0, atol=1e-12)


def test_size_one_grid_dimension():
    # A collapsed (size-1) axis interpolates as a constant along that
    # dimension, matching map_coordinates' degenerate-axis clamp.
    grids = [jnp.linspace(0.0, 1.0, 5), jnp.zeros(1),
             jnp.linspace(0.0, 1.0, 4)]
    vals = jnp.arange(20.0).reshape(5, 1, 4)
    x = jnp.asarray([[0.5], [0.0], [1.0 / 3.0]])
    out = float(lin_interp(x, vals, grids)[0])
    expected = float(jnp.arange(20.0).reshape(5, 4)[2, 1])  # exact node
    np.testing.assert_allclose(out, expected, rtol=1e-12)
