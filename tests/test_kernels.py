"""Pallas kernel tests (interpret mode — compiled path is validated on TPU).

The fused kernels are the f32 fast tier; agreement bounds below reflect the
f32 floor (relative ~1e-6 on the log iterate), not kernel bugs — exactness
at f64 is covered by the XLA-path tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import (GCY, SSY, T_ssy_factory,
                                   discretize_ssy, solve)
from sdfs_via_autodiff_tpu.kernels.fused_discrete import (
    kron_operands_ssy, make_fused_T_log_ssy)
from sdfs_via_autodiff_tpu.kernels.solver_kernel import make_fused_solver_ssy

SHAPES = (8, 8, 6, 6)


@pytest.fixture(scope="module")
def setup():
    model = SSY()
    disc = discretize_ssy(model, SHAPES)
    return model, disc


@pytest.mark.fast


def test_kron_operands_match_factored_chain(setup, rng):
    # M1 @ v @ M2^T must equal the per-axis contraction chain.
    from sdfs_via_autodiff_tpu.operators.discrete_ssy import (
        _hw_theta_factored, _ssy_factors)
    model, disc = setup
    M1, M2T, log_kap = kron_operands_ssy(model, disc, jnp.float64)
    n_l, n_k, n_i, n_j = SHAPES
    v = jnp.asarray(np.exp(rng.standard_normal(SHAPES)))
    B_lam, A2, A3 = _ssy_factors(model, disc)
    chain = _hw_theta_factored(v, B_lam, disc.h_c_Q, disc.h_z_Q, disc.z_P,
                               jnp.ones_like(A2), jnp.ones_like(A3))
    kron = (M1 @ v.reshape(n_l * n_k, n_i * n_j) @ M2T).reshape(SHAPES)
    np.testing.assert_allclose(np.asarray(kron), np.asarray(chain),
                               rtol=1e-10)
    # log_kappa carries the A2/A3 factors.
    np.testing.assert_allclose(
        np.asarray(jnp.exp(log_kap.reshape(SHAPES))),
        np.asarray(A2[None, :, None, None]
                   * A3[None, None, :, :]
                   * jnp.ones((SHAPES[0], 1, 1, 1))), rtol=1e-10)


@pytest.mark.fast


def test_fused_T_matches_xla(setup, rng):
    model, disc = setup
    T64 = T_ssy_factory(model, disc, space="log")
    T_fused = make_fused_T_log_ssy(model, disc, interpret=True)
    ell = jnp.asarray(np.log(800) + 0.05 * rng.standard_normal(SHAPES))
    a = np.asarray(T64(ell))
    b = np.asarray(T_fused(ell.astype(jnp.float32))).astype(np.float64)
    assert np.max(np.abs(a - b)) < 5e-6


def test_fused_T_jvp_matches_xla(setup, rng):
    model, disc = setup
    T64 = T_ssy_factory(model, disc, space="log")
    T_fused = make_fused_T_log_ssy(model, disc, interpret=True)
    ell = jnp.asarray(np.log(800) + 0.05 * rng.standard_normal(SHAPES))
    v = jnp.asarray(rng.standard_normal(SHAPES))
    _, jv64 = jax.jvp(T64, (ell,), (v,))
    _, jv32 = jax.jvp(T_fused, (ell.astype(jnp.float32),),
                      (v.astype(jnp.float32),))
    assert np.max(np.abs(np.asarray(jv64) - np.asarray(jv32))) < 1e-4


def test_fused_T_reverse_mode(setup, rng):
    model, disc = setup
    T_fused = make_fused_T_log_ssy(model, disc, interpret=True)
    ell = jnp.full(SHAPES, jnp.log(800.0), dtype=jnp.float32)
    g = jax.grad(lambda e: jnp.sum(T_fused(e)))(ell)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_newton_solve(setup):
    model, disc = setup
    T64 = T_ssy_factory(model, disc, space="log")
    T_fused = make_fused_T_log_ssy(model, disc, interpret=True)
    ell0 = jnp.full(SHAPES, jnp.log(800.0))
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    res = solve(T_fused, ell0.astype(jnp.float32), method="newton", tol=2e-5)
    assert bool(res.converged)
    w_diff = np.max(np.abs(np.exp(np.asarray(res.x, dtype=np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 1.0          # f32 tier: ~1e-3 relative on w ~ 800


def test_fused_solver_kernel(setup):
    model, disc = setup
    T64 = T_ssy_factory(model, disc, space="log")
    fsolve = make_fused_solver_ssy(model, disc, interpret=True)
    ell0 = jnp.full(SHAPES, jnp.log(800.0))
    ell, iters, err = fsolve(ell0, 1e-6, 100_000)
    assert int(iters) > 100
    assert float(err) <= 1e-6
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    w_diff = np.max(np.abs(np.exp(np.asarray(ell, dtype=np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 2.0          # tol/(1-rate) in w units at f32


def test_fused_solver_max_iter_cap(setup):
    model, disc = setup
    fsolve = make_fused_solver_ssy(model, disc, interpret=True)
    ell0 = jnp.full(SHAPES, jnp.log(800.0))
    _, iters, err = fsolve(ell0, 0.0, 50)
    assert int(iters) == 50


def test_vmem_guard():
    model = SSY()
    disc = discretize_ssy(model, (40, 40, 40, 40))
    with pytest.raises(ValueError):
        make_fused_T_log_ssy(model, disc)
    with pytest.raises(ValueError):
        make_fused_solver_ssy(model, disc)


def test_fused_continuous_T_matches_xla(rng):
    from sdfs_via_autodiff_tpu import build_grid_ssy
    from sdfs_via_autodiff_tpu.kernels.fused_discrete import (
        make_fused_T_log_ssy_continuous)
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
        T_ssy_continuous_factory)
    model = SSY()
    grids = build_grid_ssy(model, 6, 6, 6, 8)
    T64 = T_ssy_continuous_factory(model, grids, interp="pre", space="log",
                                   quad_degree=5)
    T_fused = make_fused_T_log_ssy_continuous(model, grids, degree=5,
                                              interpret=True)
    ell = jnp.asarray(np.log(700) + 0.05 * rng.standard_normal((6, 6, 6, 8)))
    a = np.asarray(T64(ell))
    b = np.asarray(T_fused(ell.astype(jnp.float32))).astype(np.float64)
    assert np.max(np.abs(a - b)) < 5e-6


def test_fused_continuous_solver(rng):
    from sdfs_via_autodiff_tpu import build_grid_ssy, solve
    from sdfs_via_autodiff_tpu.kernels.solver_kernel import (
        make_fused_solver_ssy_continuous)
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
        T_ssy_continuous_factory)
    model = SSY()
    grids = build_grid_ssy(model, 6, 6, 6, 8)
    fsolve = make_fused_solver_ssy_continuous(model, grids, interpret=True)
    ell0 = jnp.full((6, 6, 6, 8), jnp.log(800.0))
    ell, iters, err = fsolve(ell0, 1e-6, 100_000)
    assert float(err) <= 1e-6
    T64 = T_ssy_continuous_factory(model, grids, interp="pre", space="log")
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    w_diff = np.max(np.abs(np.exp(np.asarray(ell, np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 2.0


def test_fused_gcy_T_matches_xla(rng):
    from sdfs_via_autodiff_tpu import GCY, T_gcy_factory, discretize_gcy
    from sdfs_via_autodiff_tpu.kernels.fused_discrete import (
        make_fused_T_log_gcy)
    model = GCY()
    shapes = (4, 3, 3, 3, 3, 3)
    disc = discretize_gcy(model, shapes)
    T64 = T_gcy_factory(model, disc, space="log")
    T_fused = make_fused_T_log_gcy(model, disc, interpret=True)
    ell = jnp.asarray(np.log(500) + 0.05 * rng.standard_normal(shapes))
    a = np.asarray(T64(ell))
    b = np.asarray(T_fused(ell.astype(jnp.float32))).astype(np.float64)
    assert np.max(np.abs(a - b)) < 5e-6


def test_fused_gcy_solver(rng):
    from sdfs_via_autodiff_tpu import GCY, T_gcy_factory, discretize_gcy
    from sdfs_via_autodiff_tpu.kernels.solver_kernel import (
        make_fused_solver_gcy)
    model = GCY()
    shapes = (4, 3, 3, 3, 3, 3)
    disc = discretize_gcy(model, shapes)
    fsolve = make_fused_solver_gcy(model, disc, interpret=True)
    ell0 = jnp.full(shapes, jnp.log(500.0))
    ell, iters, err = fsolve(ell0, 1e-6, 100_000)
    assert float(err) <= 1e-6
    T64 = T_gcy_factory(model, disc, space="log")
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    w_diff = np.max(np.abs(np.exp(np.asarray(ell, np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 2.0


def test_fused_anderson_kernel(setup):
    from sdfs_via_autodiff_tpu.kernels.anderson_kernel import (
        make_fused_anderson_ssy)
    model, disc = setup
    fsolve = make_fused_anderson_ssy(model, disc, interpret=True)
    ell0 = jnp.full(SHAPES, jnp.log(800.0))
    ell, iters, err = fsolve(ell0, 1e-6, 8000)
    assert float(err) <= 1e-6
    # Iteration counts near the f32 noise floor vary with rounding; the
    # point is convergence far below SA's O(10^4).
    assert int(iters) < 5000
    T64 = T_ssy_factory(model, disc, space="log")
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    w_diff = np.max(np.abs(np.exp(np.asarray(ell, np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 1.0


def test_fused_gcy_continuous_T_matches_xla(rng):
    # GCY continuous (quadrature + pre-interp), baseline-normalized
    # two-matmul kernel vs the f64 XLA factored operator.
    from sdfs_via_autodiff_tpu.kernels.fused_discrete import (
        make_fused_T_log_gcy_continuous)
    from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
        T_gcy_continuous_factory)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    grids = build_grid_gcy(model, 4, 3, 3, 3, 4, 3)
    T = make_fused_T_log_gcy_continuous(model, grids, degree=5,
                                        interpret=True)
    T64 = T_gcy_continuous_factory(model, grids, method="quadrature",
                                   interp="pre", space="log",
                                   baseline="loglinear")
    ell = jnp.asarray(T.baseline_log_w, jnp.float64) \
        + 0.02 * rng.standard_normal(T.baseline_log_w.shape)
    got = T(ell.astype(jnp.float32))
    want = T64(ell)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(want), rtol=0, atol=5e-5)


def _gcy_coarse_baseline(model, grids):
    """Additive (ANOVA) baseline fitted on an f64 solve of the same grids —
    the production recipe for GCY f32 (the log-linear closed form is ~4.4
    log units off at corners; theta-folding that into the composed column
    operand overflows f32)."""
    from sdfs_via_autodiff_tpu.operators.continuous_common import (
        additive_profiles)
    from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
        T_gcy_continuous_factory)
    T64 = T_gcy_continuous_factory(model, grids, method="quadrature",
                                   interp="pre", space="log")
    ell0 = jnp.full(tuple(len(g) for g in grids), jnp.log(500.0))
    ref = solve(T64, ell0, method="newton", tol=1e-11)
    return additive_profiles(np.asarray(ref.x)), ref


def test_fused_gcy_continuous_solver(rng):
    from sdfs_via_autodiff_tpu.kernels.solver_kernel import (
        make_fused_solver_gcy_continuous)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    grids = build_grid_gcy(model, 4, 3, 3, 3, 4, 3)
    baseline, ref = _gcy_coarse_baseline(model, grids)
    fsolve = make_fused_solver_gcy_continuous(model, grids, degree=5,
                                              baseline=baseline,
                                              interpret=True)
    ell0 = fsolve.baseline_log_w
    ell, iters, err = fsolve(ell0, 1e-6, 100_000)
    assert float(err) <= 1e-6
    w_diff = np.max(np.abs(np.exp(np.asarray(ell, np.float64))
                           - np.exp(np.asarray(ref.x))))
    assert w_diff < 2.0


def test_fused_gcy_continuous_anderson(rng):
    from sdfs_via_autodiff_tpu.kernels.anderson_kernel import (
        make_fused_anderson_gcy_continuous)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy

    model = GCY()
    grids = build_grid_gcy(model, 4, 3, 3, 3, 4, 3)
    baseline, _ = _gcy_coarse_baseline(model, grids)
    fsolve = make_fused_anderson_gcy_continuous(model, grids, degree=5,
                                                baseline=baseline,
                                                interpret=True)
    ell0 = fsolve.baseline_log_w
    ell, iters, err = fsolve(ell0, 1e-6, 20_000)
    assert float(err) <= 1e-6
    assert bool(jnp.all(jnp.isfinite(ell)))


def test_fused_gcy_continuous_coarse_baseline_operands():
    # With the coarse baseline the composed column operand stays in a
    # sane f32 range (the loglinear fold reaches ~1e27 on these grids).
    from sdfs_via_autodiff_tpu.kernels.fused_discrete import (
        kron_operands_gcy_continuous)
    from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy
    model = GCY()
    grids = build_grid_gcy(model, 3, 3, 3, 3, 3, 3)
    baseline, _ = _gcy_coarse_baseline(model, grids)
    _, M2T, _, _, _, _, _ = kron_operands_gcy_continuous(
        model, grids, 5, baseline, jnp.float32)
    assert float(jnp.max(jnp.abs(M2T))) < 1e6


def test_lse_matmul_row_normalization_is_exact():
    # lse_matmul row-normalizes M internally (log rowsum added to the
    # output): scaling any row of M by a huge factor must shift the
    # result by exactly log(scale) and change nothing else.
    from sdfs_via_autodiff_tpu.ops.contract import lse_matmul

    rng = np.random.default_rng(3)
    M = jnp.asarray(rng.uniform(0.1, 1.0, (5, 6)))
    v = jnp.asarray(rng.standard_normal((4, 6)))
    base = lse_matmul(M, v, "om,km->ko", 1)
    scaled = lse_matmul(M.at[2].mul(1e80), v, "om,km->ko", 1)
    np.testing.assert_allclose(np.asarray(scaled[:, 2]),
                               np.asarray(base[:, 2]) + np.log(1e80),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(scaled[:, [0, 1, 3, 4]]),
                               np.asarray(base[:, [0, 1, 3, 4]]),
                               rtol=1e-12)


def test_lse_matmul_deep_window_recovers_localized_rows():
    # Localized rows over a 150-decade f32 span (the wide-Rouwenhorst
    # class): row o's whole mass sits below the joint shift's ~87-decade
    # window, so pass 1 underflows to log(0) = -inf; the deep_window
    # second pass recovers the true finite value.
    from sdfs_via_autodiff_tpu.ops.contract import lse_matmul

    n = 8
    v = jnp.asarray(np.linspace(-150.0, 0.0, n),
                    jnp.float32).reshape(1, n)
    M = jnp.asarray(np.eye(n), jnp.float32)
    out0 = lse_matmul(M, v, "om,km->ko", 1)
    assert not bool(jnp.isfinite(out0).all())          # the failure mode
    out = lse_matmul(M, v, "om,km->ko", 1, deep_window=80.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)
    # f64 input: the deep window is a no-op and stays exact.
    out64 = lse_matmul(jnp.asarray(np.eye(n)),
                       jnp.asarray(np.asarray(v), jnp.float64),
                       "om,km->ko", 1, deep_window=80.0)
    np.testing.assert_allclose(np.asarray(out64), np.asarray(v, np.float64),
                               atol=1e-12)


def test_lse_matmul_deep_window_custom_jvp_matches_plain():
    # The deep path carries a custom JVP (one tangent einsum through the
    # deep window — naive autodiff of the two-pass primal doubled Newton's
    # inner-matvec memory and compile-OOMed the 25.2M case): its
    # jvp/vjp must agree with the single-window autodiff wherever pass 1
    # doesn't underflow, and stay finite where it does.
    from sdfs_via_autodiff_tpu.ops.contract import lse_matmul

    rng = np.random.default_rng(7)
    M = jnp.asarray(rng.uniform(0.1, 1.0, (5, 6)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 6)) * 3, jnp.float32)
    dv = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    dM = jnp.asarray(rng.standard_normal((5, 6)), jnp.float32) * 0.01
    f = lambda M, v: lse_matmul(M, v, "om,km->ko", 1, deep_window=80.0)
    f0 = lambda M, v: lse_matmul(M, v, "om,km->ko", 1)
    out, t = jax.jvp(f, (M, v), (dM, dv))
    out0, t0 = jax.jvp(f0, (M, v), (dM, dv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=1e-5)
    g = jax.grad(lambda v: jnp.sum(jnp.sin(f(M, v))))(v)
    g0 = jax.grad(lambda v: jnp.sum(jnp.sin(f0(M, v))))(v)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g0), atol=1e-5)
    # Localized rows (pass-1 underflow): tangent finite and correct —
    # identity M makes out = v, so d out/d v = 1 everywhere.
    n = 8
    vloc = jnp.asarray(np.linspace(-150.0, 0.0, n),
                       jnp.float32).reshape(1, n)
    Me = jnp.asarray(np.eye(n), jnp.float32)
    outl, tl = jax.jvp(
        lambda v: lse_matmul(Me, v, "om,km->ko", 1, deep_window=80.0),
        (vloc,), (jnp.ones_like(vloc),))
    np.testing.assert_allclose(np.asarray(outl), np.asarray(vloc),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(tl), 1.0, atol=1e-5)


def test_lse_matmul_three_window_tangent_covers_ultra_deep_rows():
    # Rows 167-247 nats below the slice max: reachable only by the K=3
    # primal, and the pre-round-5 single-window tangent ZEROED them —
    # measured consequence: Newton on the 12.6M wide-Rouwenhorst SSY
    # case treated ladder-corner rows as plain SA steps and stalled at
    # residual 0.13 after 25 outer iterations.  The multi-window JVP
    # must give the exact softmax derivative (= 1.0 against an identity
    # M) at every depth the primal covers.
    from sdfs_via_autodiff_tpu.ops.contract import lse_matmul

    n = 10
    depths = np.linspace(-240.0, 0.0, n)       # spans all three windows
    vloc = jnp.asarray(depths, jnp.float32).reshape(1, n)
    Me = jnp.asarray(np.eye(n), jnp.float32)
    f = lambda v: lse_matmul(Me, v, "om,km->ko", 1,
                             deep_window=80.0, deep_passes=3)
    out, t = jax.jvp(f, (vloc,), (jnp.ones_like(vloc),))
    np.testing.assert_allclose(np.asarray(out), np.asarray(vloc), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-5)
    # Mixed rows (non-identity M): tangent agrees with f64 autodiff of
    # the exact log-sum-exp at every covered depth.
    rng = np.random.default_rng(3)
    M = np.zeros((4, n))
    M[0, :3] = rng.uniform(0.5, 1.0, 3)         # shallow row
    M[1, 4:6] = rng.uniform(0.5, 1.0, 2)        # ~107-133 nat row
    M[2, 6:8] = rng.uniform(0.5, 1.0, 2)        # ~53-80: shallow
    M[3, :2] = rng.uniform(0.5, 1.0, 2)         # ~187-213: window 3
    Mf = jnp.asarray(M, jnp.float32)
    dv = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    _, t32 = jax.jvp(
        lambda v: lse_matmul(Mf, v, "om,km->ko", 1,
                             deep_window=80.0, deep_passes=3),
        (vloc,), (dv,))

    def exact64(v):
        with np.errstate(divide="ignore"):
            logM = jnp.asarray(np.log(M))
        t = logM[None, :, :] + v[:, None, :]        # (k, o, m)
        m = jnp.max(t, axis=-1, keepdims=True)
        return m[..., 0] + jnp.log(jnp.sum(jnp.exp(t - m), axis=-1))

    _, t64 = jax.jvp(exact64, (jnp.asarray(depths).reshape(1, n),),
                     (jnp.asarray(np.asarray(dv), jnp.float64),))
    np.testing.assert_allclose(np.asarray(t32), np.asarray(t64),
                               rtol=2e-4, atol=2e-5)


def test_lse_matmul_deep_window_subnormal_band_full_precision():
    # Depths in (87.3, 103.2] nats land pass 1's contraction in the f32
    # SUBNORMAL range: "u > 0" passes, but log(u) then quantizes in
    # ~0.01-0.1-nat steps (1-2 mantissa bits).  Measured consequence at
    # the 12.6M wide-Rouwenhorst SSY north star: ~0.1-nat noise per
    # application, Newton AND Anderson both stalled at residual ~0.1.
    # The selection floor must be the smallest NORMAL f32 so these rows
    # ride the deep window at full precision.
    from sdfs_via_autodiff_tpu.ops.contract import lse_matmul

    depths = np.linspace(-102.0, -88.0, 8)     # the subnormal band
    n = len(depths) + 1
    v = jnp.asarray(np.append(depths, 0.0), jnp.float32).reshape(1, n)
    M = jnp.asarray(np.eye(n), jnp.float32)
    out = lse_matmul(M, v, "om,km->ko", 1, deep_window=80.0,
                     deep_passes=3)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(v)[0],
                               atol=2e-5)
    # And the tangent in the same band is the exact softmax derivative
    # (1.0 against identity M), not subnormal-ratio noise.
    _, t = jax.jvp(
        lambda vv: lse_matmul(M, vv, "om,km->ko", 1, deep_window=80.0,
                              deep_passes=3),
        (v,), (jnp.ones_like(v),))
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-5)
