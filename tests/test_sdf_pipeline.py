"""SDF output pipeline: checkpoints, w* callables, simulation, moments."""

import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import (
    SSY, GCY, construct_wstar_callable, load_solution, save_solution,
    sdf_factory_ssy, simulate_states, simulated_w_moments,
    ssy_loglinear_factory, wc_ratio_continuous)


@pytest.fixture(scope="module")
def ssy_solution():
    model = SSY()
    sol = wc_ratio_continuous(model, (4, 4, 4, 6), algorithm="newton",
                              tol=1e-9, interp="pre")
    assert sol.converged
    return model, sol


def test_checkpoint_roundtrip(tmp_path, ssy_solution):
    model, sol = ssy_solution
    path = str(tmp_path / "ssy.npz")
    save_solution(path, model, sol.grids, sol.w_star,
                  meta=dict(algorithm="newton"))
    ckpt = load_solution(path)
    assert ckpt.model_name == "SSY"
    assert ckpt.model_params["beta"] == model.beta
    assert ckpt.meta["algorithm"] == "newton"
    np.testing.assert_allclose(ckpt.w_star, np.asarray(sol.w_star))
    for g, g2 in zip(ckpt.grids, sol.grids):
        np.testing.assert_allclose(g, np.asarray(g2))


def test_wstar_callable_from_checkpoint(tmp_path, ssy_solution):
    model, sol = ssy_solution
    path = str(tmp_path / "ssy.npz")
    save_solution(path, model, sol.grids, sol.w_star)
    f = construct_wstar_callable(datafile=path)
    # Exact at grid points.
    x = jnp.asarray([g[1] for g in sol.grids])
    np.testing.assert_allclose(float(f(x)), float(sol.w_star[1, 1, 1, 1]),
                               rtol=1e-12)
    # Batch evaluation.
    xs = jnp.stack([x, x * 0.5], axis=1)
    assert f(xs).shape == (2,)


def test_driver_checkpoint_kwarg(tmp_path):
    model = SSY()
    path = str(tmp_path / "drv.npz")
    sol = wc_ratio_continuous(model, (3, 3, 3, 4), algorithm="newton",
                              tol=1e-8, interp="pre", checkpoint_path=path)
    ckpt = load_solution(path)
    assert ckpt.meta["kind"] == "continuous"
    assert ckpt.meta["iterations"] == int(sol.result.iterations)


def test_simulate_states_shapes_and_stationarity():
    model = SSY()
    path = simulate_states(model, 20000, seed=7)
    assert path.shape == (4, 20000)
    # h processes are mean-zero stationary AR(1)s; sample mean ~ 0 and
    # sample std close to the stationary std.
    stds = model.h_stationary_std()
    for i, s in enumerate(stds):
        assert abs(float(path[i].mean())) < 5 * s
        assert 0.5 * s < float(path[i].std()) < 1.5 * s


def test_simulated_w_moments(ssy_solution):
    model, sol = ssy_solution
    f = construct_wstar_callable(sol.w_star, sol.grids)
    mean, std = simulated_w_moments(model, f, num_steps=50_000, seed=3)
    w = np.asarray(sol.w_star)
    assert w.min() - 3 * std <= mean <= w.max() + 3 * std
    assert std > 0


def test_gcy_simulation():
    model = GCY()
    path = simulate_states(model, 5000, seed=11)
    assert path.shape == (6, 5000)
    assert np.isfinite(np.asarray(path)).all()


def test_sdf_positive_and_finite(ssy_solution):
    model, sol = ssy_solution
    f = construct_wstar_callable(sol.w_star, sol.grids)
    sdf = sdf_factory_ssy(model, f)
    path = simulate_states(model, 500, seed=5)
    m_vals = [float(sdf(path[:, t], path[:, t + 1], 0.1))
              for t in range(0, 400, 40)]
    assert all(np.isfinite(m_vals))
    assert all(v > 0 for v in m_vals)


def test_loglinear_vs_solved_wc():
    # The log-linear closed form should be in the same ballpark as a
    # solved continuous w* at the state-space center on a reasonably fine
    # grid (validation oracle, reference ssy_test_continuous.md:200-225).
    # Uses the factored pre-interp path, which solves 15^3 x 20 in seconds;
    # at this config the solved center (~676) also matches the reference's
    # simulated E[w] = 670.75 at 15^4/std=3.2/d=5 (BASELINE.md).
    model = SSY()
    sol = wc_ratio_continuous(model, (15, 15, 15, 20), algorithm="newton",
                              tol=1e-9, interp="pre")
    assert sol.converged
    ll = ssy_loglinear_factory(model)
    w_ll = np.exp(ll(np.zeros(4)))
    w_num = float(sol.w_star[7, 7, 7, 10])
    assert 0.5 < w_ll / w_num < 2.0
    assert 600 < w_num < 760


def test_grid_continuation_matches_cold_solve():
    from sdfs_via_autodiff_tpu import wc_ratio_continuation
    model = SSY()
    cold = wc_ratio_continuous(model, (10, 10, 10, 12), algorithm="newton",
                               tol=1e-9, interp="pre")
    cont = wc_ratio_continuation(model, [(5, 5, 5, 6), (10, 10, 10, 12)],
                                 algorithm="newton", tol=1e-9, interp="pre")
    assert cont.converged
    # Same fixed point, and the warm-started final level needs fewer
    # Newton iterations than the cold solve.
    np.testing.assert_allclose(np.asarray(cont.w_star),
                               np.asarray(cold.w_star), atol=1e-7)
    assert int(cont.result.iterations) <= int(cold.result.iterations)


def test_prolong_w_exact_on_nested_grids():
    from sdfs_via_autodiff_tpu import build_grid_ssy
    from sdfs_via_autodiff_tpu.drivers import prolong_w
    import jax.numpy as jnp
    model = SSY()
    coarse = build_grid_ssy(model, 5, 5, 5, 5)
    fine = build_grid_ssy(model, 9, 9, 9, 9)   # nodes nest (2n-1)
    w = jnp.exp(jnp.arange(5 ** 4, dtype=jnp.float64).reshape(5, 5, 5, 5)
                * 1e-4 + 6.0)
    wf = prolong_w(w, coarse, fine)
    # Every coarse node appears at even fine indices with the same value
    # (log-space interpolation is exact at nodes).
    np.testing.assert_allclose(np.asarray(wf)[::2, ::2, ::2, ::2],
                               np.asarray(w), rtol=1e-12)


def test_risk_free_rate():
    # r_f(x) = -log E_x[M'] should be a small positive monthly rate at the
    # state-space center for the SSY calibration, and the sdf expectation
    # must be close to the Euler-equation restriction's scale.
    from sdfs_via_autodiff_tpu import (expected_sdf_ssy, risk_free_rate_ssy,
                                       wc_ratio_continuous,
                                       construct_wstar_callable)
    model = SSY()
    sol = wc_ratio_continuous(model, (10, 10, 10, 12), algorithm="newton",
                              tol=1e-9, interp="pre")
    f = construct_wstar_callable(sol.w_star, sol.grids)
    e_m = expected_sdf_ssy(model, f)(jnp.zeros(4))
    assert 0.9 < float(e_m) < 1.05      # monthly discount factor scale
    r = risk_free_rate_ssy(model, f)(jnp.zeros(4))
    assert -0.05 < float(r) < 0.05
    # Higher long-run growth state -> higher risk-free rate.
    x_hi = jnp.asarray([0.0, 0.0, 0.0, float(sol.grids[3][-2])])
    x_lo = jnp.asarray([0.0, 0.0, 0.0, float(sol.grids[3][1])])
    assert float(risk_free_rate_ssy(model, f)(x_hi)) > \
        float(risk_free_rate_ssy(model, f)(x_lo))


def test_checkpoint_warm_resume(tmp_path):
    # Warm-resume workflow: load a checkpoint's w* as the next solve's
    # initial guess (the reference supports this implicitly via w_init,
    # ssy_wc_ratio_continuous.py:232).
    model = SSY()
    path = str(tmp_path / "warm.npz")
    sol1 = wc_ratio_continuous(model, (5, 5, 5, 6), algorithm="newton",
                               tol=1e-6, interp="pre", checkpoint_path=path)
    ckpt = load_solution(path)
    sol2 = wc_ratio_continuous(model, (5, 5, 5, 6), algorithm="newton",
                               tol=1e-10, interp="pre",
                               w_init=ckpt.w_star)
    assert sol2.converged
    assert int(sol2.result.iterations) <= int(sol1.result.iterations) + 2


def test_gcy_risk_free_rate():
    from sdfs_via_autodiff_tpu import (construct_wstar_callable,
                                       expected_sdf_gcy, risk_free_rate_gcy,
                                       wc_ratio_continuous)
    model = GCY()
    # The (w'/(w-1))^(theta-1) term with theta-1 = -37 amplifies any
    # level bias in w; a moderately fine grid is needed for a meaningful
    # E[M] scale.
    sol = wc_ratio_continuous(model, (6, 6, 6, 6, 12, 6), algorithm="newton",
                              tol=1e-8, interp="pre", quad_degree=3)
    f = construct_wstar_callable(sol.w_star, sol.grids)
    e_m = expected_sdf_gcy(model, f)(jnp.zeros(6))
    assert 0.5 < float(e_m) < 1.05
    r = risk_free_rate_gcy(model, f)(jnp.zeros(6))
    assert np.isfinite(float(r)) and float(r) > 0


def test_closed_form_xi_matches_full_quadrature():
    # The consumption shock integrates in closed form (pricing module
    # docstring); cross-check E_x[M'] against the brute-force rule that
    # quadratures xi too.
    import jax
    import jax.numpy as jnp

    from sdfs_via_autodiff_tpu import SSY, wc_ratio_continuous
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
        next_state_ssy)
    from sdfs_via_autodiff_tpu.ops.interp import lin_interp
    from sdfs_via_autodiff_tpu.ops.quadrature import (
        tensor_quadrature_normal)
    from sdfs_via_autodiff_tpu.sdf import expected_sdf, sdf_factory

    model = SSY()
    sol = wc_ratio_continuous(model, (5, 5, 5, 6), tol=1e-9)
    f = jax.jit(lambda x: lin_interp(x, sol.w_star, sol.grids))
    e_sdf = expected_sdf(model, f, degree=5)

    nodes, weights = tensor_quadrature_normal([5] * 5)
    nodes, weights = jnp.asarray(nodes), jnp.asarray(weights)
    sdf = sdf_factory(model, f)

    for state in ([0.0, 0.0, 0.0, 0.0], [0.1, -0.1, 0.05, 0.002]):
        x = jnp.asarray(state)
        x_next = next_state_ssy(model, x[:, None], nodes[:4])
        brute = float(jnp.dot(sdf(x[:, None], x_next, nodes[4]), weights))
        np.testing.assert_allclose(float(e_sdf(x)), brute, rtol=1e-7)
