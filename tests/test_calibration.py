"""Moment-matching calibration (Gauss-Newton on IFT gradients).

Ground truth by construction: targets are generated with the same
differentiable moment pipeline at a known calibration; the calibrator
must recover the perturbed parameters.  (The reference's calibration
workflow is manual notebook re-runs — ``test_newton.md:198-238`` — so
the oracle here is parameter recovery, not parity.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import (SSY, calibrate_moments,
                                   one_step_moments_differentiable,
                                   wc_ratio_differentiable)
from sdfs_via_autodiff_tpu.ops.grids import build_grid_ssy

SIZES = (4, 4, 4, 5)


def _targets(truth, fields):
    wc_fn, p0 = wc_ratio_differentiable(truth, SIZES, fields=fields,
                                        quad_degree=3, tol=1e-10)
    grids = build_grid_ssy(truth, *SIZES, num_std_devs=3.2,
                           dtype=jnp.float64)
    draws = jax.random.normal(jax.random.PRNGKey(1234), (4, 8000),
                              dtype=jnp.float64)
    mu, sd = one_step_moments_differentiable(truth, grids, wc_fn(p0), draws)
    return float(mu), float(sd)


def test_recovers_perturbed_beta():
    truth = SSY()
    mu, _ = _targets(truth, ("beta",))
    start = dataclasses.replace(truth, beta=0.9985)
    cal, info = calibrate_moments(start, SIZES, {"mean": mu},
                                  fields=("beta",), quad_degree=3,
                                  tol=1e-10, num_draws=8000, max_steps=10)
    assert info["converged"]
    np.testing.assert_allclose(cal.beta, truth.beta, atol=5e-6)


@pytest.mark.slow
def test_recovers_beta_and_gamma():
    truth = SSY()
    mu, sd = _targets(truth, ("beta", "gamma"))
    start = dataclasses.replace(truth, beta=0.9985, gamma=9.5)
    cal, info = calibrate_moments(start, SIZES, {"mean": mu, "std": sd},
                                  fields=("beta", "gamma"), quad_degree=3,
                                  tol=1e-10, num_draws=8000, max_steps=12)
    assert info["converged"]
    np.testing.assert_allclose(cal.beta, truth.beta, atol=1e-6)
    np.testing.assert_allclose(cal.gamma, truth.gamma, atol=1e-4)


@pytest.mark.fast
def test_validation_errors():
    with pytest.raises(ValueError, match="unknown target"):
        calibrate_moments(SSY(), SIZES, {"median": 1.0})
    with pytest.raises(ValueError, match="empty targets"):
        calibrate_moments(SSY(), SIZES, {})
    with pytest.raises(ValueError, match="need >="):
        calibrate_moments(SSY(), SIZES, {"mean": 1.0, "std": 1.0},
                          fields=("beta",))
    with pytest.raises(ValueError, match="continuous"):
        calibrate_moments(SSY(), SIZES, {"mean": 1.0}, fields=("beta",),
                          kind="discrete")


def test_risk_free_rate_gradient_composes_through_pricing():
    """Deep-parameter sensitivities of *prices*: jax.grad flows through
    solve (IFT) -> w* interpolation -> SDF quadrature -> r_f, and matches
    a finite-difference re-solve of the whole pipeline."""
    from sdfs_via_autodiff_tpu import risk_free_rate_ssy
    from sdfs_via_autodiff_tpu.ops.interp import lin_interp

    model = SSY()
    wc_fn, p0 = wc_ratio_differentiable(model, SIZES, fields=("gamma",),
                                        quad_degree=3, tol=1e-10)
    grids = build_grid_ssy(model, *SIZES, num_std_devs=3.2,
                           dtype=jnp.float64)
    x_eval = jnp.zeros(4)

    def rf(p):
        w_grid = wc_fn(p)
        m = dataclasses.replace(model, gamma=p["gamma"])
        # States arrive as (4,) or (4, N); interp wants (dim, N).
        w_func = lambda x: lin_interp(x.reshape(4, -1), w_grid,
                                      grids).reshape(
                                          x.shape[1:] if x.ndim > 1 else ())
        return risk_free_rate_ssy(m, w_func, degree=3)(x_eval)

    g = jax.grad(rf)(p0)
    eps = 1e-5
    fd = (float(rf({"gamma": p0["gamma"] + eps}))
          - float(rf({"gamma": p0["gamma"] - eps}))) / (2 * eps)
    np.testing.assert_allclose(float(g["gamma"]), fd, rtol=2e-4)
    assert np.isfinite(float(g["gamma"]))


@pytest.mark.slow
def test_gcy_recovers_perturbed_beta():
    from sdfs_via_autodiff_tpu import GCY
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    truth = GCY()
    sizes = (3, 3, 3, 3, 4, 3)
    wc_fn, p0 = wc_ratio_differentiable(truth, sizes, fields=("beta",),
                                        quad_degree=3, tol=1e-10)
    grids = build_grid_gcy(truth, *sizes, num_std_devs=3.2,
                           dtype=jnp.float64)
    draws = jax.random.normal(jax.random.PRNGKey(7), (6, 8000),
                              dtype=jnp.float64)
    mu, _ = one_step_moments_differentiable(truth, grids, wc_fn(p0), draws)
    start = dataclasses.replace(truth, beta=0.9983)
    cal, info = calibrate_moments(start, sizes, {"mean": float(mu)},
                                  fields=("beta",), quad_degree=3,
                                  tol=1e-10, num_draws=8000, max_steps=10)
    assert info["converged"]
    np.testing.assert_allclose(cal.beta, truth.beta, atol=5e-6)
