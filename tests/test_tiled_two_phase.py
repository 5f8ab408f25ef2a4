"""Tiled two-phase operator: agreement with the XLA operators + autodiff.

The Pallas kernels run in interpret mode on the CPU test backend; the
hardware lowering is exercised by the TPU benchmarks.  Oracle: the f64
per-axis operators (``T_ssy_factory`` / ``T_ssy_continuous_factory``),
which are themselves validated against loop oracles and dense H.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import SSY, discretize_ssy, T_ssy_factory, solve
from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
    make_tiled_T_log, make_tiled_T_log_ssy, make_tiled_T_log_ssy_continuous)
from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
    T_ssy_continuous_factory, build_grid_ssy)
from sdfs_via_autodiff_tpu.operators.two_phase import (
    make_xla_two_phase_T, two_phase_operands_ssy,
    two_phase_operands_ssy_continuous)

SHAPES = (4, 5, 6, 7)


def _rand_ell(shapes, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.log(800.0) + scale * rng.standard_normal(shapes))


@pytest.fixture(scope="module")
def ssy_disc():
    model = SSY()
    return model, discretize_ssy(model, SHAPES)


class TestDiscreteSSY:
    @pytest.mark.fast
    def test_xla_twin_matches_reference_operator(self, ssy_disc):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        T_ref = T_ssy_factory(model, disc, space="log")
        T_two = make_xla_two_phase_T(ops, dtype=jnp.float64)
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(T_two(ell), T_ref(ell), rtol=1e-12)

    def test_xla_twin_normalized_matches(self, ssy_disc):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc, baseline="loglinear")
        T_ref = T_ssy_factory(model, disc, space="log",
                              baseline="loglinear", dtype=jnp.float64)
        T_two = make_xla_two_phase_T(ops, dtype=jnp.float64)
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(T_two(ell), T_ref(ell), rtol=1e-11)

    @pytest.mark.parametrize("baseline", [None, "loglinear"])
    @pytest.mark.parametrize("mode", ["lse", "fast"])
    def test_tiled_kernel_matches_twin(self, ssy_disc, baseline, mode):
        model, disc = ssy_disc
        T = make_tiled_T_log_ssy(model, disc, baseline=baseline, mode=mode,
                                 interpret=True)
        assert T.mode == mode
        ell = _rand_ell(SHAPES).astype(jnp.float32)
        got = T(ell)
        want = T.xla_twin(ell)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)

    def test_strip_mixed_transcendentals(self, ssy_disc):
        # The strip tier's "mixed" tier (added so dispatch fallback
        # preserves the setting): numerically inside the f32 class on
        # CPU interpret mode, and the flag is recorded.
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log)
        T = make_tiled_T_log(ops, engine="strip", transcendentals="mixed",
                             interpret=True)
        assert T.engine == "strip" and T.transcendentals == "mixed"
        ell = _rand_ell(SHAPES)
        T_ref = T_ssy_factory(model, disc, space="log")
        np.testing.assert_allclose(np.asarray(T(ell.astype(jnp.float32)),
                                              np.float64),
                                   np.asarray(T_ref(ell)), atol=5e-5)

    @pytest.mark.fast

    def test_auto_mode_selection(self, ssy_disc):
        # Plain operands: small certified range -> fast single-shift path.
        # Normalized operands: folded factors carry exp(theta*delta-phi)
        # weights whose running products overflow without the interleaved
        # LSE renormalization -> lse.
        model, disc = ssy_disc
        assert make_tiled_T_log_ssy(model, disc, interpret=True).mode == "fast"
        assert make_tiled_T_log_ssy(model, disc, baseline="loglinear",
                                    interpret=True).mode == "lse"

    def test_tiled_matches_f64_operator(self, ssy_disc):
        model, disc = ssy_disc
        T = make_tiled_T_log_ssy(model, disc, interpret=True)
        T_ref = T_ssy_factory(model, disc, space="log")
        ell = _rand_ell(SHAPES)
        got = T(ell.astype(jnp.float32))
        np.testing.assert_allclose(got, T_ref(ell), rtol=5e-5, atol=5e-5)

    def test_jvp_matches_f64_twin_jvp(self, ssy_disc):
        model, disc = ssy_disc
        T = make_tiled_T_log_ssy(model, disc, interpret=True)
        T64 = make_xla_two_phase_T(two_phase_operands_ssy(model, disc),
                                   dtype=jnp.float64)
        ell = _rand_ell(SHAPES)
        v = _rand_ell(SHAPES, seed=7, scale=1.0) - jnp.log(800.0)
        _, dout = jax.jvp(T, (ell.astype(jnp.float32),),
                          (v.astype(jnp.float32),))
        _, want = jax.jvp(T64, (ell,), (v,))
        np.testing.assert_allclose(dout, want, rtol=2e-4, atol=2e-5)

    def test_linearize_and_vjp_work(self, ssy_disc):
        model, disc = ssy_disc
        T = make_tiled_T_log_ssy(model, disc, interpret=True)
        ell = _rand_ell(SHAPES).astype(jnp.float32)
        y, lin = jax.linearize(T, ell)
        v = 0.01 * jnp.ones(SHAPES, jnp.float32)
        dv = lin(v)
        assert dv.shape == SHAPES and bool(jnp.all(jnp.isfinite(dv)))
        # reverse mode through the custom JVP
        grad = jax.grad(lambda e: jnp.sum(T(e)))(ell)
        assert grad.shape == SHAPES and bool(jnp.all(jnp.isfinite(grad)))

    def test_newton_through_tiled_matches_reference_solution(self, ssy_disc):
        model, disc = ssy_disc
        T = make_tiled_T_log_ssy(model, disc, interpret=True)
        T_ref = T_ssy_factory(model, disc, space="log")
        ell0 = jnp.full(SHAPES, jnp.log(800.0))
        ref = solve(T_ref, ell0, method="newton", tol=1e-10)
        got = solve(T, ell0.astype(jnp.float32), method="newton", tol=2e-5)
        assert got.converged
        np.testing.assert_allclose(got.x, ref.x, rtol=0, atol=5e-4)


class TestContinuousSSY:
    @pytest.fixture(scope="class")
    def grids(self):
        return build_grid_ssy(SSY(), 4, 5, 6, 7, num_std_devs=3.2)

    def test_xla_twin_matches_factored_operator(self, grids):
        model = SSY()
        ops = two_phase_operands_ssy_continuous(model, grids, degree=5)
        T_ref = T_ssy_continuous_factory(model, grids, method="quadrature",
                                         interp="pre", space="log")
        T_two = make_xla_two_phase_T(ops, dtype=jnp.float64)
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(T_two(ell), T_ref(ell), rtol=1e-12)

    @pytest.mark.parametrize("baseline", [None, "loglinear"])
    @pytest.mark.parametrize("mode", ["lse", "fast"])
    def test_tiled_kernel_matches_twin(self, grids, baseline, mode):
        model = SSY()
        T = make_tiled_T_log_ssy_continuous(model, grids, degree=5,
                                            baseline=baseline, mode=mode,
                                            interpret=True)
        ell = _rand_ell(SHAPES).astype(jnp.float32)
        np.testing.assert_allclose(T(ell), T.xla_twin(ell),
                                   rtol=2e-6, atol=2e-6)

    def test_baseline_warm_start_exposed(self, grids):
        model = SSY()
        T = make_tiled_T_log_ssy_continuous(model, grids, baseline="loglinear",
                                            interpret=True)
        assert T.baseline_log_w.shape == SHAPES


class TestStripSelection:
    def test_lane_aligned_sizes(self):
        # 8^4: R = C = 64, C % 128 != 0 -> fallback strip path.
        model = SSY()
        disc = discretize_ssy(model, (8, 8, 8, 8))
        T = make_tiled_T_log_ssy(model, disc, interpret=True)
        TB, TC = T.strip_sizes
        assert 64 % TB == 0 and 64 % TC == 0
        ell = _rand_ell((8, 8, 8, 8)).astype(jnp.float32)
        T_ref = T_ssy_factory(model, disc, space="log")
        np.testing.assert_allclose(T(ell), T_ref(ell.astype(jnp.float64)),
                                   rtol=5e-5, atol=5e-5)

    def test_rejects_f64(self):
        model = SSY()
        disc = discretize_ssy(model, SHAPES)
        ops = two_phase_operands_ssy(model, disc)
        with pytest.raises(ValueError):
            make_tiled_T_log(ops, dtype=jnp.float64)


class TestGCYKron:
    """Six-state GCY folded into the 4-D two-phase structure by
    Kronecker grouping (rows z (x) z_pi / h_z (x) h_zpi, columns h_c /
    h_lam)."""

    SHAPES = (4, 3, 3, 4, 3, 5)

    @pytest.fixture(scope="class")
    def gcy_setup(self):
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        model = GCY()
        disc = discretize_gcy(model, self.SHAPES)
        return model, disc

    def test_kron_twin_matches_chain(self, gcy_setup, rng):
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import T_gcy_factory
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T, two_phase_operands_gcy)
        model, disc = gcy_setup
        ops = two_phase_operands_gcy(model, disc)
        T_twin = make_xla_two_phase_T(ops, jnp.float64)
        T_ref = T_gcy_factory(model, disc, space="log", jit=False)
        ell = jnp.asarray(np.log(300.0)
                          + 0.1 * rng.standard_normal(self.SHAPES))
        view_shapes = tuple(self.SHAPES[p] for p in ops.perm)
        got = jnp.transpose(
            T_twin(jnp.transpose(ell, ops.perm).reshape(ops.shapes))
            .reshape(view_shapes), ops.inv_perm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(T_ref(ell)),
                                   atol=1e-11, rtol=0)

    def test_tiled_kernel_matches_chain(self, gcy_setup, rng):
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import T_gcy_factory
        model, disc = gcy_setup
        Tk = make_tiled_T_log_gcy(model, disc, interpret=True)
        assert Tk.mode == "lse"     # theta=-36 range needs per-axis LSE
        T_ref = T_gcy_factory(model, disc, space="log", jit=False)
        ell = jnp.asarray(np.log(300.0)
                          + 0.1 * rng.standard_normal(self.SHAPES))
        np.testing.assert_allclose(np.asarray(Tk(ell)),
                                   np.asarray(T_ref(ell)), atol=1e-5,
                                   rtol=0)

    def test_tiled_kernel_autodiff(self, gcy_setup, rng):
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import T_gcy_factory
        model, disc = gcy_setup
        Tk = make_tiled_T_log_gcy(model, disc, interpret=True)
        T_ref = T_gcy_factory(model, disc, space="log", jit=False)
        ell = jnp.asarray(np.log(300.0)
                          + 0.1 * rng.standard_normal(self.SHAPES))
        v = jnp.asarray(rng.standard_normal(self.SHAPES))
        _, d = jax.jvp(Tk, (ell,), (v,))
        _, dref = jax.jvp(T_ref, (ell,), (v,))
        np.testing.assert_allclose(np.asarray(d), np.asarray(dref),
                                   atol=2e-4, rtol=0)

    def test_driver_solve_interpret(self, gcy_setup):
        # End-to-end Newton through the kernel in interpret mode via the
        # solver API (the driver's kernel="tiled" path on TPU).
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.solvers.api import solve
        model, disc = gcy_setup
        Tk = make_tiled_T_log_gcy(model, disc, interpret=True)
        ell0 = jnp.full(self.SHAPES, jnp.log(300.0), jnp.float32)
        res = solve(Tk, ell0, method="newton", tol=5e-5, max_iter=20)
        assert bool(res.converged)


class TestGCYNormalized:
    """Baseline-normalized GCY folded into the two-phase grouping: the
    log-linear baseline conjugates into shared row factors + rank-2 lazy
    batched column factors (the z chain's sigma_z scale AND z_pi mean
    shift), exact vs both the per-axis normalized chain and the plain
    operator."""

    SHAPES = (6, 5, 4, 3, 4, 3)

    @pytest.fixture(scope="class", params=["rouwenhorst", "tauchen"])
    def gcy_norm(self, request):
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            two_phase_operands_gcy)
        model = GCY()
        disc = discretize_gcy(model, self.SHAPES, method=request.param)
        ops = two_phase_operands_gcy(model, disc, baseline="loglinear")
        return model, disc, ops, request.param

    def _natural(self, ops, out_v):
        view_shapes = tuple(self.SHAPES[p] for p in ops.perm)
        return jnp.transpose(out_v.reshape(view_shapes), ops.inv_perm)

    def test_twin_matches_plain_and_normalized_chain(self, gcy_norm, rng):
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T)
        model, disc, ops, _ = gcy_norm
        assert ops.c1_batched and ops.c2_batched and ops.has_sub
        T64 = make_xla_two_phase_T(ops, jnp.float64)
        Tn = T_gcy_factory(model, disc, space="log", baseline="loglinear",
                           dtype=jnp.float64, jit=False)
        Tp = T_gcy_factory(model, disc, space="log", dtype=jnp.float64,
                           jit=False)
        ell = jnp.asarray(np.log(300.0)
                          + 0.3 * rng.standard_normal(self.SHAPES))
        got = self._natural(
            ops, T64(jnp.transpose(ell, ops.perm).reshape(ops.shapes)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(Tn(ell)),
                                   atol=1e-12, rtol=0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(Tp(ell)),
                                   atol=1e-12, rtol=0)

    def test_fold_accepts_f32_built_grids(self, rng):
        # An f32-built discretization rounds the (truly separable)
        # z ladder by ~eps(f32); the fold's separability check is
        # dtype-aware, and accepting it is exact — the rank-2
        # reconstruction g is used consistently in both sub and add
        # corrections, so the operator value is baseline-independent.
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T, two_phase_operands_gcy)
        model = GCY()
        ell = jnp.asarray(np.log(300.0)
                          + 0.3 * rng.standard_normal(self.SHAPES))
        for method in ("rouwenhorst", "tauchen"):
            disc32 = discretize_gcy(model, self.SHAPES,
                                    dtype=jnp.float32, method=method)
            ops = two_phase_operands_gcy(model, disc32,
                                         baseline="loglinear")
            T64 = make_xla_two_phase_T(ops, jnp.float64)
            Tp = T_gcy_factory(model, disc32, space="log",
                               dtype=jnp.float64, jit=False)
            got = self._natural(
                ops, T64(jnp.transpose(ell, ops.perm).reshape(ops.shapes)))
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(Tp(ell)),
                                       atol=1e-9, rtol=0)

    def test_rank2_lazy_matches_dense(self, gcy_norm):
        _, _, ops, _ = gcy_norm
        dense = lambda lz: np.exp(
            lz[0][None] + np.einsum("kb,kxy->bxy", lz[2], lz[1]))
        assert ops.lazy_c1[1].shape[0] == 2      # rank 2
        np.testing.assert_allclose(dense(ops.lazy_c1), ops.W_c1,
                                   rtol=1e-12)
        np.testing.assert_allclose(dense(ops.lazy_c2), ops.W_c2,
                                   rtol=1e-12)

    def test_conjugates_to_shared_mid_free(self, gcy_norm, rng):
        # The full-matrix rank-2 conjugation lifts to shared factors
        # with NO mid_col (gauge residue folds into sub/add) -> the
        # streamed tier covers normalized GCY.
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            conjugate_to_shared, make_xla_two_phase_T)
        model, disc, ops, _ = gcy_norm
        conj = conjugate_to_shared(ops)
        assert conj is not None
        assert not conj.c1_batched and not conj.c2_batched
        assert not conj.has_mid
        Tc = make_xla_two_phase_T(conj, jnp.float64)
        Tp = T_gcy_factory(model, disc, space="log", dtype=jnp.float64,
                           jit=False)
        ell = jnp.asarray(np.log(300.0)
                          + 0.3 * rng.standard_normal(self.SHAPES))
        got = self._natural(
            conj, Tc(jnp.transpose(ell, conj.perm).reshape(conj.shapes)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(Tp(ell)),
                                   atol=1e-12, rtol=0)

    def test_tiled_kernel_lazy_and_dense(self, gcy_norm, rng):
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        model, disc, ops, _ = gcy_norm
        T_ref = T_gcy_factory(model, disc, space="log", dtype=jnp.float64,
                              jit=False)
        ell = jnp.asarray(np.asarray(ops.baseline_log_w).reshape(
            tuple(self.SHAPES[p] for p in ops.perm)), jnp.float64)
        ell = jnp.transpose(ell, ops.inv_perm)
        ell = ell + jnp.asarray(0.05 * rng.standard_normal(self.SHAPES))
        want = np.asarray(T_ref(ell))
        for kw in (dict(engine="strip"), dict(engine="strip",
                                              lazy_bytes=0), {}):
            Tk = make_tiled_T_log_gcy(model, disc, baseline="loglinear",
                                      interpret=True, **kw)
            np.testing.assert_allclose(
                np.asarray(Tk(ell), np.float64), want, atol=5e-6, rtol=0)
        assert np.allclose(np.asarray(Tk.baseline_log_w),
                           np.asarray(jnp.transpose(
                               jnp.asarray(ops.baseline_log_w).reshape(
                                   tuple(self.SHAPES[p] for p in ops.perm)),
                               ops.inv_perm)))

    def test_solve_normalized(self, gcy_norm):
        # Newton on the Rouwenhorst fixture; Anderson on Tauchen (tiny
        # +-3-sigma tauchen grids give Newton's f32 inner BiCGStab an
        # ill-conditioned Jacobian — the PLAIN operator stalls there
        # identically, so it is a property of the discretized problem,
        # not of the normalized fold).
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.solvers.api import solve
        model, disc, _, method = gcy_norm
        Tk = make_tiled_T_log_gcy(model, disc, baseline="loglinear",
                                  interpret=True)
        ell0 = jnp.asarray(Tk.baseline_log_w, jnp.float32)
        if method == "tauchen":
            res = solve(Tk, ell0, method="anderson", tol=5e-5,
                        max_iter=400)
        else:
            res = solve(Tk, ell0, method="newton", tol=5e-5, max_iter=20)
        assert bool(res.converged)

    def test_wide_rouwenhorst_conjugated_floor_warning(self):
        # Wide-Rouwenhorst spans push the conjugated-shared factors'
        # log range below f32's representable floor, where flushed
        # entries (re-amplified by the conjugation corrections) degrade
        # accuracy; the factory warns with the measured ladder instead
        # of silently returning a wrong operator (docs/math.md §6b:
        # sup error 1.2e-6 above factor log-range -144, 0.22 at -221).
        import warnings
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        model = GCY()
        disc = discretize_gcy(model, (32, 16, 16, 4, 16, 8))
        with pytest.warns(UserWarning, match="flush to zero"):
            T = make_tiled_T_log_gcy(model, disc, baseline="loglinear")
        assert T.mode == "lse"
        # The in-envelope fixture grids must NOT warn.
        disc_ok = discretize_gcy(model, (12, 8, 8, 4, 8, 8))
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            make_tiled_T_log_gcy(model, disc_ok, baseline="loglinear")
        assert not [w for w in caught
                    if "flush to zero" in str(w.message)]


def test_lazy_batched_factors_match_dense(rng):
    # Force the lazy (logW0, D, t) slice materialization of the
    # normalized operator's batched column factors and check it against
    # the dense-resident kernel and the XLA twin.
    from sdfs_via_autodiff_tpu import SSY, discretize_ssy
    from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
        make_tiled_T_log_ssy)
    from sdfs_via_autodiff_tpu.operators.two_phase import (
        make_xla_two_phase_T, two_phase_operands_ssy)

    model = SSY()
    disc = discretize_ssy(model, (6, 5, 6, 16))
    ops = two_phase_operands_ssy(model, disc, baseline="loglinear")
    # rank-k lazy decomposition reproduces the dense batched factors
    # exactly: W[b] = exp(log0 + sum_k t[k, b] * D[k])
    dense = lambda lz: np.exp(lz[0][None]
                              + np.einsum("kb,kxy->bxy", lz[2], lz[1]))
    np.testing.assert_allclose(dense(ops.lazy_c2), ops.W_c2, rtol=1e-12)
    np.testing.assert_allclose(dense(ops.lazy_c1), ops.W_c1, rtol=1e-12)

    T_lazy = make_tiled_T_log_ssy(model, disc, baseline="loglinear",
                                  lazy_bytes=0, interpret=True)
    T_dense = make_tiled_T_log_ssy(model, disc, baseline="loglinear",
                                   interpret=True)
    T64 = make_xla_two_phase_T(ops, jnp.float64)
    ell = jnp.asarray(np.asarray(ops.baseline_log_w)
                      + 0.05 * rng.standard_normal(disc.shapes))
    a = np.asarray(T_lazy(ell))
    np.testing.assert_allclose(a, np.asarray(T_dense(ell)), atol=2e-6,
                               rtol=0)
    np.testing.assert_allclose(a, np.asarray(T64(ell)), atol=1e-5, rtol=0)


def test_dense_placeholder_fallback_raises_real_error():
    # A dense=False operand set (the make_tiled_T_log_gcy streamed
    # probe) cannot run the strip tier; when the streamed tier rejects
    # an option combination (mode="fast" on a deferred-c2 set), the
    # engine="auto" fallback must propagate the streamed tier's error,
    # not the strip builder's misleading "rebuild with dense=True".
    import warnings

    from sdfs_via_autodiff_tpu import GCY, discretize_gcy
    from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
        _streamed_config, streamed_coverable)
    from sdfs_via_autodiff_tpu.operators.two_phase import (
        two_phase_operands_gcy)

    model = GCY()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        disc = discretize_gcy(model, (8, 8, 16, 8, 32, 8),
                              dtype=jnp.float32)
        ops = two_phase_operands_gcy(model, disc, baseline="loglinear",
                                     dense=False)
        assert getattr(ops, "dense_placeholder", False)
        cov = streamed_coverable(ops)
        assert cov is not None
        assert _streamed_config(cov)["kind"] == "deferred"
        with pytest.raises(ValueError, match="per-axis LSE only"):
            make_tiled_T_log(ops, mode="fast", interpret=True)
