"""Implicit differentiation through the fixed point.

Validates IFT gradients three ways: an analytic linear fixed point (exact
gradient), central finite differences through full re-solves (SSY and a
nonlinear toy), and forward/reverse consistency (directional derivative
from :func:`implicit_sensitivity` vs the VJP gradient).

The reference has no parameter-gradient capability at all (its solvers
return only the fixed point, ``code/solvers.py:154-177``); this subsystem
is new surface, so the oracles are mathematical rather than parity-based.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import SSY, wc_ratio_differentiable
from sdfs_via_autodiff_tpu.solvers import (implicit_fixed_point,
                                           implicit_sensitivity)


def test_linear_analytic_gradient():
    # T(p, x) = 0.5 x + p a  =>  x* = 2 p a ; loss = sum(x*^2) = 4 p^2 |a|^2.
    a = jnp.linspace(1.0, 2.0, 16)

    def T_of_p(p, x):
        return 0.5 * x + p["c"] * a

    p0 = {"c": jnp.asarray(1.3)}
    loss = lambda p: jnp.sum(
        implicit_fixed_point(T_of_p, p, jnp.zeros_like(a),
                             method="successive_approx", tol=1e-13) ** 2)
    g = jax.grad(loss)(p0)
    expected = 8.0 * 1.3 * jnp.sum(a ** 2)
    np.testing.assert_allclose(g["c"], expected, rtol=1e-9)


def test_nonlinear_fd_gradient():
    # A contraction with nontrivial parameter coupling:
    # T(p, x) = alpha * tanh(x + s) + mu,  p = (alpha, mu).
    s = jnp.linspace(-1.0, 1.0, 8)
    x0 = jnp.zeros(8)

    def T_of_p(p, x):
        return p["alpha"] * jnp.tanh(x + s) + p["mu"]

    def loss_at(alpha, mu):
        p = {"alpha": jnp.asarray(alpha), "mu": jnp.asarray(mu)}
        x = implicit_fixed_point(T_of_p, p, x0,
                                 method="successive_approx", tol=1e-13)
        return jnp.mean(x ** 3)

    p0 = {"alpha": jnp.asarray(0.6), "mu": jnp.asarray(0.2)}
    g = jax.grad(lambda p: jnp.mean(
        implicit_fixed_point(T_of_p, p, x0, method="successive_approx",
                             tol=1e-13) ** 3))(p0)
    eps = 1e-6
    fd_alpha = (loss_at(0.6 + eps, 0.2) - loss_at(0.6 - eps, 0.2)) / (2 * eps)
    fd_mu = (loss_at(0.6, 0.2 + eps) - loss_at(0.6, 0.2 - eps)) / (2 * eps)
    np.testing.assert_allclose(g["alpha"], fd_alpha, rtol=1e-6)
    np.testing.assert_allclose(g["mu"], fd_mu, rtol=1e-6)


def test_forward_reverse_consistency():
    s = jnp.linspace(-1.0, 1.0, 8)
    x0 = jnp.zeros(8)

    def T_of_p(p, x):
        return p["alpha"] * jnp.tanh(x + s) + p["mu"]

    p0 = {"alpha": jnp.asarray(0.6), "mu": jnp.asarray(0.2)}
    loss = lambda p: jnp.mean(
        implicit_fixed_point(T_of_p, p, x0, method="successive_approx",
                             tol=1e-13) ** 3)
    g = jax.grad(loss)(p0)
    dp = {"alpha": jnp.asarray(0.7), "mu": jnp.asarray(-0.3)}
    x_star = implicit_fixed_point(T_of_p, p0, x0,
                                  method="successive_approx", tol=1e-13)
    dx = implicit_sensitivity(T_of_p, p0, dp, x_star, rtol=1e-12)
    # d loss = <dloss/dx, dx> with loss = mean(x^3).
    directional = jnp.sum(3 * x_star ** 2 * dx) / x_star.size
    expected = g["alpha"] * dp["alpha"] + g["mu"] * dp["mu"]
    np.testing.assert_allclose(directional, expected, rtol=1e-8)


@pytest.mark.slow
def test_ssy_calibration_gradient_vs_fd():
    model = SSY()
    sizes = (4, 4, 4, 4)
    wc_fn, p0 = wc_ratio_differentiable(
        model, sizes, fields=("beta", "gamma"), quad_degree=3, tol=1e-11)
    loss = lambda p: jnp.mean(jnp.log(wc_fn(p)))
    g = jax.grad(loss)(p0)
    assert all(np.isfinite(float(v)) for v in g.values())

    eps_b, eps_g = 1e-7, 1e-5
    def at(beta, gamma):
        return float(loss({"beta": jnp.asarray(beta),
                           "gamma": jnp.asarray(gamma)}))
    b0, g0 = float(p0["beta"]), float(p0["gamma"])
    fd_beta = (at(b0 + eps_b, g0) - at(b0 - eps_b, g0)) / (2 * eps_b)
    fd_gamma = (at(b0, g0 + eps_g) - at(b0, g0 - eps_g)) / (2 * eps_g)
    np.testing.assert_allclose(float(g["beta"]), fd_beta, rtol=2e-4)
    np.testing.assert_allclose(float(g["gamma"]), fd_gamma, rtol=2e-4)


@pytest.mark.slow
def test_ssy_sensitivity_matches_grad_direction():
    model = SSY()
    sizes = (4, 4, 4, 4)
    wc_fn, p0 = wc_ratio_differentiable(
        model, sizes, fields=("beta",), quad_degree=3, tol=1e-11, space="log")
    # Reverse-mode gradient of mean(log w*).
    g = jax.grad(lambda p: jnp.mean(jnp.log(wc_fn(p))))(p0)

    # Forward-mode: solve once, one sensitivity solve in the beta direction.
    import dataclasses as dc
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (_factored_T,
                                                                build_grid_ssy)
    grids = build_grid_ssy(model, *sizes, num_std_devs=3.2,
                           dtype=jnp.float64)

    def T_of_p(p, x):
        m = dc.replace(model, beta=p["beta"])
        return _factored_T(m, grids, 3, "log", jnp.float64, None)(x)

    x_star = jnp.log(wc_fn(p0))
    dx = implicit_sensitivity(T_of_p, p0, {"beta": jnp.asarray(1.0)}, x_star,
                              rtol=1e-10)
    np.testing.assert_allclose(float(jnp.mean(dx)), float(g["beta"]),
                               rtol=1e-6)


def test_bad_field_raises():
    with pytest.raises(ValueError):
        wc_ratio_differentiable(SSY(), (4, 4, 4, 4), fields=("nope",))


def test_discrete_preference_gradient_vs_fd():
    model = SSY()
    shapes = (4, 4, 4, 4)
    wc_fn, p0 = wc_ratio_differentiable(
        model, shapes, fields=("gamma", "mu_c"), kind="discrete", tol=1e-11)
    loss = lambda p: jnp.mean(jnp.log(wc_fn(p)))
    g = jax.grad(loss)(p0)

    eps_g, eps_m = 1e-5, 1e-7
    def at(gamma, mu_c):
        return float(loss({"gamma": jnp.asarray(gamma),
                           "mu_c": jnp.asarray(mu_c)}))
    g0, m0 = float(p0["gamma"]), float(p0["mu_c"])
    fd_gamma = (at(g0 + eps_g, m0) - at(g0 - eps_g, m0)) / (2 * eps_g)
    fd_mu = (at(g0, m0 + eps_m) - at(g0, m0 - eps_m)) / (2 * eps_m)
    np.testing.assert_allclose(float(g["gamma"]), fd_gamma, rtol=2e-4)
    np.testing.assert_allclose(float(g["mu_c"]), fd_mu, rtol=2e-4)


def test_discrete_rejects_dynamics_fields():
    with pytest.raises(ValueError, match="preference fields"):
        wc_ratio_differentiable(SSY(), (4, 4, 4, 4), fields=("rho_z",),
                                kind="discrete")


def test_adjoint_stagnation_warns(capfd):
    # A stagnated adjoint Krylov solve must not silently return a wrong
    # gradient: the residual check surfaces it (and stays quiet when the
    # solve converges).
    rng = np.random.default_rng(0)
    Q, _ = np.linalg.qr(rng.standard_normal((40, 40)))
    M = jnp.asarray(Q @ np.diag(np.linspace(0.2, 0.999, 40)) @ Q.T)
    T = lambda p, x: M @ x + p

    def grad_with(mi):
        return jax.grad(lambda p: jnp.sum(implicit_fixed_point(
            T, p, jnp.zeros(40), tol=1e-13, adjoint_maxiter=mi)))(
                jnp.ones(40))

    grad_with(3)
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "stagnated" in out.out + out.err

    grad_with(300)
    jax.effects_barrier()
    out = capfd.readouterr()
    assert "stagnated" not in out.out + out.err
