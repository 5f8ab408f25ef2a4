"""de Groot alternative-specification operator (companion paper
``temp.tex:1421-1516``): oracle, closed-form mapping, log-space,
state-dependent discounting, existence condition."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import (GCY, SSY, T_ssy_factory, discretize_gcy,
                                   discretize_ssy, solve)
from sdfs_via_autodiff_tpu.operators.degroot import (
    T_degroot_factory, existence_check_degroot)

SHAPES = (4, 3, 5, 6)


@pytest.fixture(scope="module")
def setup():
    model = SSY()
    return model, discretize_ssy(model, SHAPES)


def _dense_K_ssy(model, disc):
    """Dense K~ oracle: Kron of plain transition factors x A2 A3 tilt."""
    from sdfs_via_autodiff_tpu.operators.discrete_ssy import _ssy_factors
    _, A2, A3 = _ssy_factors(model, disc)
    K = np.einsum("lL,kK,iI,jJ->lkijLKIJ",
                  np.asarray(disc.h_lam_Q), np.asarray(disc.h_c_Q),
                  np.asarray(disc.h_z_Q), np.asarray(disc.z_P))
    K = K * np.asarray(A2)[None, :, None, None, None, None, None, None] \
          * np.asarray(A3)[None, None, :, :, None, None, None, None]
    n = int(np.prod(SHAPES))
    return K.reshape(n, n)


@pytest.mark.fast
def test_operator_matches_dense_oracle(setup, rng):
    model, disc = setup
    T = T_degroot_factory(model, disc)
    K = _dense_K_ssy(model, disc)
    g = np.exp(rng.standard_normal(SHAPES))
    theta, beta = model.theta, model.beta
    k = (K @ g.reshape(-1)).reshape(SHAPES)
    expected = (1 - beta + beta * k ** (1 / theta)) ** theta
    np.testing.assert_allclose(np.asarray(T(jnp.asarray(g))), expected,
                               rtol=1e-10)


@pytest.mark.fast
def test_h1_no_lambda_maps_to_standard_fixed_point():
    # With h == 1 and no preference shocks the de Groot solution is
    # g* = ((1-beta) w*)^theta for the standard fixed point w* (module
    # docstring derivation) — an exact cross-model oracle.
    model = dataclasses.replace(SSY(), s_lam=0.0)
    disc = discretize_ssy(model, SHAPES)
    w_star = solve(T_ssy_factory(model, disc), jnp.full(SHAPES, 800.0),
                   method="newton", tol=1e-11).x
    T = T_degroot_factory(model, disc)
    g0 = jnp.full(SHAPES, float(((1 - model.beta) * 800.0) ** model.theta))
    res = solve(T, g0, method="newton", tol=1e-13)
    assert bool(res.converged)
    expected = ((1 - model.beta) * np.asarray(w_star)) ** model.theta
    np.testing.assert_allclose(np.asarray(res.x), expected, rtol=1e-8)


def test_log_space_consistent(setup, rng):
    model, disc = setup
    T = T_degroot_factory(model, disc)
    T_log = T_degroot_factory(model, disc, space="log")
    g = jnp.asarray(np.exp(rng.standard_normal(SHAPES))) * 1e-3
    np.testing.assert_allclose(np.exp(np.asarray(T_log(jnp.log(g)))),
                               np.asarray(T(g)), rtol=1e-11)


def test_monotone(setup, rng):
    model, disc = setup
    T = T_degroot_factory(model, disc)
    g = jnp.asarray(np.exp(rng.standard_normal(SHAPES)))
    assert np.all(np.asarray(T(g + 0.5)) >= np.asarray(T(g)) - 1e-14)


def test_state_dependent_discount_solves(setup):
    model, disc = setup
    # a_t rises with z (procyclical patience), values safely in (0, 1/beta).
    z_dev = disc.z_states - jnp.mean(disc.z_states)
    h = 1.0 + 40.0 * z_dev[None, None, :, :] / (1 + jnp.abs(40.0 * z_dev.max()))
    h = jnp.clip(jnp.broadcast_to(h, SHAPES), 0.9, 1.0004)
    T = T_degroot_factory(model, disc, h=h)
    rep = existence_check_degroot(model, disc, h=h)
    assert rep.exists_unique
    g0 = jnp.full(SHAPES, float((0.001 * 800.0) ** model.theta))
    res = solve(T, g0, method="newton", tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(T(res.x)), np.asarray(res.x),
                               atol=1e-11)


def test_h_validation(setup):
    model, disc = setup
    with pytest.raises(ValueError, match="1/beta"):
        T_degroot_factory(model, disc, h=1.0 / model.beta)


def test_existence_report(setup):
    model, disc = setup
    rep = existence_check_degroot(model, disc)
    assert rep.exists_unique                    # default calibration
    # r(K~) excludes the lambda tilt, so it differs from r(H); the
    # S_alt formula is ln beta + ln 1 + ln r / theta.
    expected = float(np.log(model.beta) + np.log(rep.spectral_radius)
                     / model.theta)
    np.testing.assert_allclose(rep.S_alt, expected, rtol=1e-12)


def test_gcy_degroot_smoke():
    model = GCY()
    shapes = (3, 3, 3, 3, 3, 3)
    disc = discretize_gcy(model, shapes)
    rep = existence_check_degroot(model, disc)
    assert rep.exists_unique
    T = T_degroot_factory(model, disc)
    g0 = jnp.full(shapes, float(((1 - model.beta) * 800.0) ** model.theta))
    res = solve(T, g0, method="newton", tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(T(res.x)), np.asarray(res.x),
                               atol=1e-11)


def test_log_tier_f32_per_axis_lse():
    # The per-axis LSE chain keeps the log tier exact-in-structure at
    # float32 even where the iterate sits at ln g ~ 110 (the GCY h=1
    # scale) — the global-shift form this replaced loses headroom as
    # grid width grows.  f32 evaluation agrees with f64 to ~f32 eps
    # relative on the output.
    from sdfs_via_autodiff_tpu.operators.degroot import (
        T_degroot_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    sizes = (3, 3, 3, 3, 4, 3)
    g64 = build_grid_gcy(model, *sizes)
    g32 = build_grid_gcy(model, *sizes, dtype=jnp.float32)
    T64 = T_degroot_continuous_factory(model, g64, quad_degree=3,
                                       space="log")
    T32 = T_degroot_continuous_factory(model, g32, quad_degree=3,
                                       space="log", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ell = 110.0 + rng.standard_normal(sizes)
    out64 = np.asarray(T64(jnp.asarray(ell)))
    out32 = np.asarray(T32(jnp.asarray(ell, jnp.float32)))
    assert out32.dtype == np.float32
    np.testing.assert_allclose(out32, out64, rtol=2e-6)


def test_degroot_driver_end_to_end():
    # Driver parity surface: discrete + continuous kinds through the
    # two-stage log-tier recipe, solution returned in ln g.
    from sdfs_via_autodiff_tpu.drivers import degroot_fixed_point

    model = SSY()
    sol = degroot_fixed_point(model, (4, 3, 4, 5), kind="discrete",
                              tol=1e-11)
    assert sol.converged and sol.space == "log"
    # h=1, so the closed-form scale anchor applies loosely: ln g* should
    # sit near theta * ln((1-beta) * w*) with w* a few hundred.
    import numpy as np
    lo, hi = (float(jnp.min(sol.log_g_star)), float(jnp.max(sol.log_g_star)))
    assert model.theta * np.log(0.003 * 2000) < lo <= hi \
        < model.theta * np.log(0.0005 * 200)
    sol_c = degroot_fixed_point(model, (4, 4, 4, 5), kind="continuous",
                                quad_degree=3, h=0.98, tol=1e-11)
    assert sol_c.converged and sol_c.grids is not None
    assert np.isfinite(float(jnp.max(sol_c.g_star)))


def test_degroot_checkpoint_roundtrip(tmp_path):
    from sdfs_via_autodiff_tpu.drivers import degroot_fixed_point
    from sdfs_via_autodiff_tpu.utils.checkpoint import load_solution

    path = str(tmp_path / "degroot.npz")
    sol = degroot_fixed_point(SSY(), (3, 3, 3, 3), tol=1e-10,
                              checkpoint_path=path)
    ckpt = load_solution(path)
    assert ckpt.meta["spec"] == "degroot" and ckpt.meta["field"] == "log_g"
    np.testing.assert_array_equal(ckpt.w_star, np.asarray(sol.log_g_star))


@pytest.mark.fast
def test_continuous_matches_dense_oracle(rng):
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
        _factored_arrays_ssy)
    from sdfs_via_autodiff_tpu.operators.degroot import (
        T_degroot_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_ssy

    model = SSY()
    sizes = (4, 3, 4, 5)
    grids = build_grid_ssy(model, *sizes)
    arrs = _factored_arrays_ssy(model, grids, 3, None, tilt_lambda=False)
    kappa = np.exp(np.asarray(arrs["log_A2"])[:, None]
                   + np.asarray(arrs["log_A3"])[None, :])      # (k, j)
    K = np.einsum("lL,kK,iI,ijJ->lkijLKIJ",
                  np.asarray(arrs["P_lam"]), np.asarray(arrs["P_c"]),
                  np.asarray(arrs["P_hz"]), np.asarray(arrs["P_z"]))
    K = K * kappa[None, :, None, :, None, None, None, None]
    n = int(np.prod(sizes))

    T = T_degroot_continuous_factory(model, grids, quad_degree=3)
    g = np.exp(rng.standard_normal(sizes))
    theta, beta = model.theta, model.beta
    k = (K.reshape(n, n) @ g.reshape(-1)).reshape(sizes)
    expected = (1 - beta + beta * k ** (1 / theta)) ** theta
    np.testing.assert_allclose(np.asarray(T(jnp.asarray(g))), expected,
                               rtol=1e-10)


def test_continuous_log_space_and_solve(rng):
    from sdfs_via_autodiff_tpu.operators.degroot import (
        T_degroot_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_ssy

    model = SSY()
    grids = build_grid_ssy(model, 5, 5, 5, 6)
    T = T_degroot_continuous_factory(model, grids, quad_degree=3)
    T_log = T_degroot_continuous_factory(model, grids, quad_degree=3,
                                         space="log")
    g = jnp.asarray(np.exp(rng.standard_normal((5, 5, 5, 6)))) * 1e-3
    np.testing.assert_allclose(np.exp(np.asarray(T_log(jnp.log(g)))),
                               np.asarray(T(g)), rtol=1e-11)
    # At h == 1 the continuous-grid existence margin is razor-thin
    # (S~ = ln beta + ln r(K~)/theta ~ -1.5e-3 on this grid), so solve
    # with a modest discount margin — state-dependent discounting being
    # the point of the de Groot specification (temp.tex:1440-1482).
    T_h = T_degroot_continuous_factory(model, grids, quad_degree=3, h=0.98)
    g0 = jnp.full((5, 5, 5, 6), float(((1 - model.beta) * 800.0)
                                      ** model.theta))
    res = solve(T_h, g0, method="newton", tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(T_h(res.x)), np.asarray(res.x),
                               atol=1e-11)


def test_continuous_gcy_matches_dense_oracle(rng):
    # 6-D dense-Kron oracle for the conditioned continuous chain:
    # P_zpi rides current (h_zpi=y, z_pi=b), P_z rides current
    # (h_z=i, z=j, z_pi=b) — the same conditioning geometry as the
    # standard GCY quadrature operator.
    from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
        _factored_arrays_gcy)
    from sdfs_via_autodiff_tpu.operators.degroot import (
        T_degroot_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    sizes = (2, 2, 2, 2, 3, 2)
    grids = build_grid_gcy(model, *sizes)
    arrs = _factored_arrays_gcy(model, grids, 3, None, tilt_lambda=False)
    kappa = np.exp(np.asarray(arrs["log_A2"])[:, None]
                   + np.asarray(arrs["log_A3"])[None, :])      # (k, j)
    K = np.einsum("lL,kK,iI,yY,ybB,ijbJ->lkiyjbLKIYJB",
                  np.asarray(arrs["P_lam"]), np.asarray(arrs["P_c"]),
                  np.asarray(arrs["P_hz"]), np.asarray(arrs["P_hzpi"]),
                  np.asarray(arrs["P_zpi"]), np.asarray(arrs["P_z"]))
    K = K * kappa[None, :, None, None, :, None,
                  None, None, None, None, None, None]
    n = int(np.prod(sizes))

    T = T_degroot_continuous_factory(model, grids, quad_degree=3)
    g = np.exp(rng.standard_normal(sizes))
    theta, beta = model.theta, model.beta
    k = (K.reshape(n, n) @ g.reshape(-1)).reshape(sizes)
    expected = (1 - beta + beta * k ** (1 / theta)) ** theta
    np.testing.assert_allclose(np.asarray(T(jnp.asarray(g))), expected,
                               rtol=1e-10)


def test_continuous_gcy_degroot_smoke():
    from sdfs_via_autodiff_tpu.operators.degroot import (
        T_degroot_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    sizes = (3, 3, 3, 3, 4, 3)
    grids = build_grid_gcy(model, *sizes)
    # At h == 1 the GCY fixed point lives at g ~ e^97..e^124 (theta = -36
    # amplifies the outer map), so the w-space tier overflows any useful
    # absolute tolerance — this is exactly the case the log tier exists
    # for.  SA to 1e-6 then Newton polish, all in ln g.
    T_log = T_degroot_continuous_factory(model, grids, quad_degree=3,
                                         space="log")
    ell0 = jnp.full(sizes, float(model.theta
                                 * np.log((1 - model.beta) * 800.0)))
    pre = solve(T_log, ell0, method="successive_approx", tol=1e-6,
                max_iter=5000)
    assert bool(pre.converged)
    res = solve(T_log, pre.x, method="newton", tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(T_log(res.x)), np.asarray(res.x),
                               atol=1e-11)
    assert 90.0 < float(jnp.min(res.x)) < float(jnp.max(res.x)) < 130.0
