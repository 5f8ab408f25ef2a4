"""Streamed two-pass operator: agreement with the XLA operators + autodiff.

Interpret-mode twins of the hardware kernels (see
``kernels/streamed_two_phase.py``); oracle is the f64 per-axis operator
chain, itself validated against loop oracles and dense H.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdfs_via_autodiff_tpu import SSY, discretize_ssy, T_ssy_factory, solve
from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
    make_streamed_T_log, streamed_supported)
from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
    T_ssy_continuous_factory, build_grid_ssy)
from sdfs_via_autodiff_tpu.operators.two_phase import (
    two_phase_operands_ssy, two_phase_operands_ssy_continuous)

SHAPES = (4, 8, 6, 64)


def _rand_ell(shapes, seed=0, scale=0.05):
    rng = np.random.default_rng(seed)
    return jnp.asarray(np.log(800.0) + scale * rng.standard_normal(shapes))


@pytest.fixture(scope="module")
def ssy_disc():
    model = SSY()
    return model, discretize_ssy(model, SHAPES)


@pytest.fixture(scope="module")
def ssy_grids():
    model = SSY()
    return model, build_grid_ssy(model, *SHAPES)


class TestDiscreteSSY:
    @pytest.mark.parametrize("mode", ["fast", "lse"])
    def test_matches_reference_operator(self, ssy_disc, mode):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        assert streamed_supported(ops)
        T = make_streamed_T_log(ops, mode=mode, interpret=True)
        T_ref = T_ssy_factory(model, disc, space="log")
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T_ref(jnp.asarray(ell, jnp.float64))),
            atol=5e-6)

    @pytest.mark.fast

    def test_auto_mode_is_fast_for_plain(self, ssy_disc):
        model, disc = ssy_disc
        T = make_streamed_T_log(two_phase_operands_ssy(model, disc),
                                interpret=True)
        assert T.mode == "fast"

    def test_jvp_through_twin(self, ssy_disc):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        T = make_streamed_T_log(ops, interpret=True)
        ell = jnp.asarray(_rand_ell(SHAPES), jnp.float32)
        v = jnp.asarray(_rand_ell(SHAPES, seed=1), jnp.float32) * 0.01
        got = jax.jvp(T, (ell,), (v,))[1]
        want = jax.jvp(T.xla_twin, (ell,), (v,))[1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        # reverse mode works (tangent is transposable)
        g = jax.grad(lambda x: jnp.sum(T(x)))(ell)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_solve_through_streamed(self, ssy_disc):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        T = make_streamed_T_log(ops, interpret=True)
        res = solve(T, jnp.full(SHAPES, jnp.log(800.0), jnp.float32),
                    method="newton", tol=2e-5)
        assert bool(res.converged)
        T64 = T_ssy_factory(model, disc, space="log")
        ref = solve(T64, jnp.full(SHAPES, jnp.log(800.0)), method="newton",
                    tol=1e-11)
        np.testing.assert_allclose(np.asarray(res.x, np.float64),
                                   np.asarray(ref.x), atol=2e-4)

    @pytest.mark.parametrize("precision,atol", [
        ("highest", 5e-6), ("3x", 1e-5), ("default", 5e-3)])
    @pytest.mark.parametrize("trx", ["accurate", "mixed", "fast"])
    def test_precision_transcendental_tiers(self, ssy_disc, precision,
                                            atol, trx):
        # Every tier combination compiles and lands inside its error
        # class vs the f64 chain.  CPU interpret mode cannot reproduce
        # the TPU hardware transcendentals' error (CPU exp/log are
        # correctly rounded), so `trx` bounds here only pin that the
        # flag routes to a working code path; the documented TPU error
        # classes are measured in docs/status.md.
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        T = make_streamed_T_log(ops, precision=precision,
                                transcendentals=trx, interpret=True)
        assert T.precision == precision
        assert T.transcendentals == trx
        T_ref = T_ssy_factory(model, disc, space="log")
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T_ref(jnp.asarray(ell, jnp.float64))), atol=atol)

    def test_batched_c1_via_conjugation(self, ssy_disc):
        # The normalized operands' batched factors are exact diagonal
        # conjugations of shared matrices (two_phase.conjugate_to_shared),
        # so the streamed kernels cover them despite the raw set being
        # batched-c1.
        from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
            streamed_coverable)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            conjugate_to_shared, make_xla_two_phase_T)
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc, baseline="loglinear")
        assert ops.c1_batched and not streamed_supported(ops)
        conj = conjugate_to_shared(ops)
        # Exact identity in f64 against the dense-batched evaluator.
        T_dense = make_xla_two_phase_T(ops, jnp.float64)
        T_conj = make_xla_two_phase_T(conj, jnp.float64)
        ell = _rand_ell(SHAPES)
        ell64 = jnp.asarray(ell, jnp.float64)
        np.testing.assert_allclose(np.asarray(T_conj(ell64)),
                                   np.asarray(T_dense(ell64)), atol=1e-12)
        assert streamed_coverable(ops) is not None
        T = make_streamed_T_log(ops, interpret=True)   # auto-conjugates
        assert T.mode == "lse"
        np.testing.assert_allclose(np.asarray(T(ell), np.float64),
                                   np.asarray(T_dense(ell64)), atol=1e-5)


class TestDeferredC2GCY:
    # GCY-like Kronecker column groups exceed the whole-(I, J) strip
    # budget; the deferred-c2 configuration contracts c1 on (TB, I, TJ)
    # blocks and moves the shared c2 map into pass C.
    SHAPES6 = (30, 8, 16, 4, 8, 8)     # (z, z_pi, h_z, h_c, h_zpi, h_lam)

    @pytest.fixture(scope="class")
    def gcy_ops(self):
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            two_phase_operands_gcy)
        model = GCY()
        disc = discretize_gcy(model, self.SHAPES6)
        return model, disc, two_phase_operands_gcy(model, disc)

    def test_config_is_deferred(self, gcy_ops):
        from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
            _streamed_config)
        _, _, ops = gcy_ops
        cfg = _streamed_config(ops)
        assert cfg is not None and cfg["kind"] == "deferred"
        assert streamed_supported(ops)

    def test_matches_xla_twin(self, gcy_ops):
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T)
        _, _, ops = gcy_ops
        T = make_streamed_T_log(ops, interpret=True)
        assert T.mode == "lse"
        T64 = make_xla_two_phase_T(ops, jnp.float64)
        ell = _rand_ell(ops.shapes, seed=5)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T64(jnp.asarray(ell, jnp.float64))), atol=5e-6)

    def test_fast_mode_rejected(self, gcy_ops):
        _, _, ops = gcy_ops
        with pytest.raises(ValueError):
            make_streamed_T_log(ops, mode="fast", interpret=True)

    def test_gcy_wrapper_routes_to_streamed(self, gcy_ops):
        # make_tiled_T_log_gcy's engine="auto" dispatch now reaches the
        # deferred streamed tier; agreement against the natural-layout
        # f64 per-axis chain (itself oracle-checked in test_discrete_gcy).
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        model, disc, ops = gcy_ops
        T = make_tiled_T_log_gcy(model, disc, interpret=True)
        assert T.mode == "lse"
        # The engine="auto" dispatch resolves precision per tier: the
        # streamed tier's default is "3x" (a strip-tier "highest"
        # leaking through here cost ~2x the matmul passes — regression
        # pin for the round-3 fix).
        assert T.engine in ("streamed", "streamed-deferred")
        assert T.precision == "3x"
        T64 = T_gcy_factory(model, disc, space="log", jit=False)
        ell = _rand_ell(self.SHAPES6, seed=6)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T64(jnp.asarray(ell, jnp.float64))), atol=5e-6)

    def test_normalized_conjugated_deferred_with_sub(self):
        # The baseline-normalized GCY set conjugates to shared factors
        # (rank-2 full-matrix corrections, mid-free) and runs the
        # deferred configuration WITH sub_row/sub_col — the sub_row
        # plumbing uses a whole-(R, 1) block + in-kernel dynamic row
        # slice (a (TB, 1) block violates Mosaic's 8-sublane rule at
        # deferred TB).
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            conjugate_to_shared, two_phase_operands_gcy)
        from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
            _streamed_config)
        model = GCY()
        shapes = (30, 8, 16, 4, 8, 8)
        disc = discretize_gcy(model, shapes)
        ops = two_phase_operands_gcy(model, disc, baseline="loglinear")
        conj = conjugate_to_shared(ops)
        assert conj is not None and conj.has_sub and not conj.has_mid
        assert _streamed_config(conj)["kind"] == "deferred"
        T = make_streamed_T_log(conj, interpret=True)
        Tp = T_gcy_factory(model, disc, space="log", dtype=jnp.float64,
                           jit=False)
        rng = np.random.default_rng(3)
        ell = jnp.asarray(np.log(300.0)
                          + 0.2 * rng.standard_normal(shapes))
        vs = tuple(shapes[p] for p in conj.perm)
        ell_v = jnp.transpose(ell, conj.perm).reshape(
            conj.shapes).astype(jnp.float32)
        out = jnp.transpose(
            jnp.asarray(T(ell_v), jnp.float64).reshape(vs), conj.inv_perm)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(Tp(ell)), atol=5e-6)

    def test_auto_dispatch_falls_back_on_incompatible_options(self,
                                                              gcy_ops):
        # A deferred-coverable set with mode="fast" (which the streamed
        # tier rejects — per-axis LSE only) must fall back to the strip
        # kernels under engine="auto" instead of propagating the
        # streamed ValueError; engine="streamed" still raises it.
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log)
        _, _, ops = gcy_ops
        T = make_tiled_T_log(ops, mode="fast", interpret=True)
        assert T.engine == "strip"
        with pytest.raises(ValueError, match="LSE only"):
            make_tiled_T_log(ops, mode="fast", engine="streamed",
                             interpret=True)
        # transcendentals="mixed" works on the strip tier too (dispatch
        # fallback must not strand an advertised tier).
        T2 = make_tiled_T_log(ops, mode="fast", transcendentals="mixed",
                              interpret=True)
        assert T2.engine == "strip" and T2.transcendentals == "mixed"

    def test_sharded_tier_matches_single_device(self, gcy_ops):
        # Deferred-c2 composed over a 4-device mesh: per-slice LSE
        # shifts are block-independent, so the per-shard kernels are
        # bit-equal to the single-device deferred kernel.
        from sdfs_via_autodiff_tpu.parallel.shard_ops import (
            streamed_shard_map_factory)
        from jax.sharding import Mesh
        _, _, ops = gcy_ops
        devs = np.array(jax.devices()[:4])
        mesh = Mesh(devs, ("dp",))
        T_sh = streamed_shard_map_factory(ops, mesh, interpret=True)
        assert T_sh.mode == "lse"
        T_1d = make_streamed_T_log(ops, interpret=True)
        ell = _rand_ell(ops.shapes, seed=7)
        ell_sh = jax.device_put(ell, T_sh.input_sharding)
        got = np.asarray(T_sh(ell_sh))
        want = np.asarray(T_1d(ell))
        np.testing.assert_array_equal(got, want)


class TestContinuousSSY:
    @pytest.mark.parametrize("mode", ["fast", "lse"])
    def test_plain_matches_reference(self, ssy_grids, mode):
        model, grids = ssy_grids
        ops = two_phase_operands_ssy_continuous(model, grids, 3)
        assert ops.c2_batched and streamed_supported(ops)
        T = make_streamed_T_log(ops, mode=mode, interpret=True)
        T_ref = T_ssy_continuous_factory(model, grids, method="quadrature",
                                         interp="pre", space="log",
                                         quad_degree=3)
        ell = _rand_ell(SHAPES)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T_ref(jnp.asarray(ell, jnp.float64))),
            atol=5e-6)

    def test_normalized_matches_reference(self, ssy_grids):
        model, grids = ssy_grids
        ops = two_phase_operands_ssy_continuous(model, grids, 3,
                                                baseline="loglinear")
        assert ops.has_sub and streamed_supported(ops)
        T = make_streamed_T_log(ops, interpret=True)
        assert T.mode == "lse"
        T_ref = T_ssy_continuous_factory(model, grids, method="quadrature",
                                         interp="pre", space="log",
                                         quad_degree=3,
                                         baseline="loglinear")
        ell = jnp.asarray(T.baseline_log_w) + 0.02 * jnp.asarray(
            np.random.default_rng(3).standard_normal(SHAPES))
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T_ref(jnp.asarray(ell, jnp.float64))),
            atol=5e-6)


class TestContinuousGCYPair:
    """Pair configuration: continuous six-state GCY, whose conditioned
    z/z_pi expectation matrices (P_z on current h_z AND z_pi, P_zpi on
    current h_zpi) contract per-slice in pass C (reference semantics
    ``/root/reference/code/gcy/continuous/gcy_wc_ratio_continuous.py:
    158-187``)."""

    # (h_lam, h_c, h_z, h_zpi, z, z_pi): n_hlam % 8, (n_hz*n_hzpi) % 8,
    # n_z % 128 — the pair configuration's layout constraints.
    GSHAPES = (8, 3, 2, 4, 128, 2)

    @pytest.fixture(scope="class")
    def gcy_pair(self):
        from sdfs_via_autodiff_tpu import GCY, build_grid_gcy
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            two_phase_operands_gcy_continuous)
        model = GCY()
        grids = build_grid_gcy(model, *self.GSHAPES)
        ops = two_phase_operands_gcy_continuous(model, grids, degree=5,
                                                baseline="loglinear")
        return model, grids, ops

    def test_config_is_pair(self, gcy_pair):
        from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
            _streamed_config)
        _, _, ops = gcy_pair
        cfg = _streamed_config(ops)
        assert cfg is not None and cfg["kind"] == "pair"
        assert streamed_supported(ops)

    def test_twin_matches_factored_chain_f64(self, gcy_pair):
        from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
            T_gcy_continuous_factory)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T)
        model, grids, ops = gcy_pair
        Ttwin = make_xla_two_phase_T(ops, dtype=jnp.float64)
        T_ref = T_gcy_continuous_factory(
            model, grids, method="quadrature", interp="pre", space="log",
            quad_degree=5, baseline="loglinear", jit=False)
        ell = _rand_ell(self.GSHAPES, scale=0.05)
        view = jnp.transpose(ell, ops.perm).reshape(ops.shapes)
        out = jnp.transpose(
            Ttwin(view).reshape([self.GSHAPES[p] for p in ops.perm]),
            ops.inv_perm)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(T_ref(ell)), atol=1e-12)

    def test_kernel_matches_factored_chain(self, gcy_pair):
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy_continuous)
        from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
            T_gcy_continuous_factory)
        model, grids, _ = gcy_pair
        T = make_tiled_T_log_gcy_continuous(model, grids, degree=5,
                                            baseline="loglinear",
                                            interpret=True)
        assert T.engine == "streamed-pair" and T.mode == "lse"
        ell = (jnp.asarray(T.baseline_log_w, jnp.float32)
               + 0.05 * jnp.asarray(np.random.default_rng(2)
                                    .standard_normal(self.GSHAPES),
                                    jnp.float32))
        T_ref = T_gcy_continuous_factory(
            model, grids, method="quadrature", interp="pre", space="log",
            quad_degree=5, baseline="loglinear", jit=False)
        np.testing.assert_allclose(
            np.asarray(T(ell), np.float64),
            np.asarray(T_ref(jnp.asarray(ell, jnp.float64))), atol=5e-5)

    def test_jvp_and_grad(self, gcy_pair):
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy_continuous)
        model, grids, _ = gcy_pair
        T = make_tiled_T_log_gcy_continuous(model, grids, degree=5,
                                            baseline="loglinear",
                                            interpret=True)
        ell = jnp.asarray(T.baseline_log_w, jnp.float32)
        v = 0.01 * jnp.ones_like(ell)
        got = jax.jvp(T, (ell,), (v,))[1]
        want = jax.jvp(T.xla_twin, (ell,), (v,))[1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        g = jax.grad(lambda x: jnp.sum(T(x)))(ell)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_solve_through_pair_kernel(self, gcy_pair):
        # The f32 recipe: a coarse-fit ADDITIVE baseline.  GCY's
        # theta = -36 with the closed-form log-linear baseline leaves
        # theta * (residual span) ~ 95 > exp's f32 range on this grid —
        # the solution itself sits outside the plain fold's envelope
        # (the same effect docs/precision.md documents for wide
        # discrete grids) — while the ANOVA main effects of the true
        # solution leave only the non-separable remainder.
        model, grids, _ = gcy_pair
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy_continuous)
        from sdfs_via_autodiff_tpu.operators.continuous_common import (
            additive_profiles)
        from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
            T_gcy_continuous_factory)
        T64 = T_gcy_continuous_factory(
            model, grids, method="quadrature", interp="pre", space="log",
            quad_degree=5, baseline="loglinear")
        res64 = solve(T64, jnp.asarray(T64.baseline_log_w, jnp.float64),
                      method="newton", tol=1e-10)
        baseline = additive_profiles(res64.x)
        T = make_tiled_T_log_gcy_continuous(model, grids, degree=5,
                                            baseline=baseline,
                                            interpret=True)
        res = solve(T, jnp.asarray(T.baseline_log_w, jnp.float32),
                    method="newton", tol=2e-4, max_iter=8)
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.x),
                                   np.asarray(res64.x, np.float32),
                                   atol=5e-4)

    def test_nonconforming_shapes_report_pair_constraints(self):
        from sdfs_via_autodiff_tpu import GCY, build_grid_gcy
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log)
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            two_phase_operands_gcy_continuous)
        model = GCY()
        grids = build_grid_gcy(model, 4, 3, 2, 4, 5, 2)   # n_z = 5
        ops = two_phase_operands_gcy_continuous(model, grids,
                                                baseline="loglinear")
        with pytest.raises(ValueError, match="pair configuration"):
            make_tiled_T_log(ops, interpret=True)


class TestTwinPrecisionTiers:
    """The 3x (bf16 hi/lo split) tier on the XLA twin / lse_matmul —
    the Newton inner-matvec knob (round-4; inexact-Newton forcing at
    1e-4-class tolerance does not need 6-pass HIGHEST matvecs)."""

    def test_twin_3x_close_to_highest_and_f64_guarded(self, ssy_disc):
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            make_xla_two_phase_T)
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        x = jnp.asarray(_rand_ell(SHAPES), jnp.float32)
        hi = make_xla_two_phase_T(ops, jnp.float32)(x)
        x3 = make_xla_two_phase_T(ops, jnp.float32, precision="3x")(x)
        assert float(jnp.max(jnp.abs(hi - x3))) < 2e-5
        # float64 operands must never take the bf16-split path.
        f64 = make_xla_two_phase_T(ops, jnp.float64, precision="3x")(x)
        f64h = make_xla_two_phase_T(ops, jnp.float64)(x)
        np.testing.assert_array_equal(np.asarray(f64), np.asarray(f64h))

    def test_newton_through_3x_twin(self, ssy_disc):
        model, disc = ssy_disc
        ops = two_phase_operands_ssy(model, disc)
        T = make_streamed_T_log(ops, twin_precision="3x", interpret=True)
        res = solve(T, jnp.full(SHAPES, jnp.log(800.0), jnp.float32),
                    method="newton", tol=2e-5)
        assert bool(res.converged)

    def test_lse_matmul_precision_tiers(self):
        from sdfs_via_autodiff_tpu.ops.contract import lse_matmul
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((8, 16, 32)), jnp.float32)
        M = jnp.asarray(np.abs(rng.standard_normal((16, 16))), jnp.float32)
        hi = lse_matmul(M, a, "im,tmj->tij", 1)
        x3 = lse_matmul(M, a, "im,tmj->tij", 1, precision="3x")
        assert float(jnp.max(jnp.abs(hi - x3))) < 5e-5
        with pytest.raises(ValueError):
            lse_matmul(M, a, "im,tmj->tij", 1, precision="nope")


def test_anderson_nan_stop_returns_best_finite_iterate():
    """Round-4: an Anderson combination that leaves the f32 operator's
    exp envelope poisons the next iterate with NaN; the solver must stop
    AND return the best finite iterate + its residual, not the poisoned
    point.  Deterministic scenario: the continuous-GCY f32 twin under
    the log-linear fold, whose true solution sits ~2.6 log units from
    the baseline (theta * span ~ 95 > exp's f32 range)."""
    from sdfs_via_autodiff_tpu import GCY, build_grid_gcy
    from sdfs_via_autodiff_tpu.operators.two_phase import (
        make_xla_two_phase_T, two_phase_operands_gcy_continuous)
    model = GCY()
    grids = build_grid_gcy(model, 8, 3, 2, 4, 128, 2)
    ops = two_phase_operands_gcy_continuous(model, grids, degree=5,
                                            baseline="loglinear")
    T32 = make_xla_two_phase_T(ops, dtype=jnp.float32)
    res = solve(T32, jnp.asarray(ops.baseline_log_w, jnp.float32),
                method="anderson", tol=2e-4, max_iter=400)
    assert not bool(res.converged)
    assert bool(jnp.isfinite(res.x).all())
    assert np.isfinite(float(res.residual))
