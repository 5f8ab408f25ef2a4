"""North-star artifact: >=10^7-point SSY wealth–consumption solves on TPU.

BASELINE.md's target: SSY on a >=10^7-point grid with sub-second Newton
steps on TPU (reference's largest recorded run: 20^4 = 160k points,
``/root/reference/code/ssy/continuous_junnan/test_newton.md:219``).

Runs the continuous (factored quadrature, pre-interp) and discrete
operators at (56, 56, 56, 64) = 11.24M points — the z axis is padded to a
128-lane-divisible column group, the TPU-native grid choice — through the
tiled two-phase Pallas kernels (f32), with a log-linear warm start.
Reports successive-approximation throughput, cached per-Newton-step time,
time-to-tolerance, and a float64 final residual check (the f32 solve's
true quality, measured with the f64 XLA operator).

Writes NORTHSTAR.json at the repo root.  Usage: python benchmarks/northstar.py
"""

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdfs_via_autodiff_tpu import SSY, discretize_ssy, solve
from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
    make_tiled_T_log_ssy, make_tiled_T_log_ssy_continuous)
from sdfs_via_autodiff_tpu.models.ssy import ssy_loglinear_factory
from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
    T_ssy_continuous_factory, build_grid_ssy)
from sdfs_via_autodiff_tpu.operators.discrete_ssy import T_ssy_factory
from sdfs_via_autodiff_tpu.ops.grids import flatten_mesh

# Continuous grids are bounded at num_std_devs * stationary sigma, so any
# axis size is f32-safe; (56, 56, 56, 64) puts the column group at 28*128
# lanes.  Discrete Rouwenhorst ladders *widen* with the point count
# (±sqrt(n-1) sigma): h-axes beyond ~32 points push sigma_z = phi_z
# exp(h_z) far enough that the iterate's theta-range underflows entire
# f32 contraction rows to zero (-inf/NaN), so the >=10^7 discrete case
# spends its points on the z axis instead.
SHAPES_CONT = (56, 56, 56, 64)     # 11_239_424 points; C = 56*64 = 28*128
SHAPES_DISC = (32, 32, 32, 384)    # 12_582_912 points; C = 32*384 = 96*128
# device_polish goes LAST: it exercises f64-emulated Newton on the TPU at
# 10^7 points for the first time, and a worker fault must not take out
# the main cases (each case is separately flushed regardless).
ALL_CASES = ("continuous", "discrete", "ssy_rouwenhorst", "gcy",
             "gcy_rouwenhorst", "gcy_continuous", "device_polish")
TOL_CONT = 2e-5     # near the accurate-transcendentals f32 floor (round 2:
                    # was 2e-4 before ops/accurate.py; the solver stall
                    # guard makes an unreachable tol safe regardless)
TOL_DISC = 2e-5     # in-envelope (Tauchen) f32 floor
# The discrete case stashes its f32 solution here (host scratch) so the
# device_polish case can reuse it instead of re-running the 12.6M-point
# f32 solve; keyed by shape in the filename to avoid stale reuse.
_X32_STASH = f"/tmp/northstar_ssy_disc_x32_{'x'.join(map(str, SHAPES_DISC))}.npy"


def loglinear_warm_start(model, grids):
    ll = ssy_loglinear_factory(model)
    x = np.asarray(flatten_mesh([np.asarray(g, np.float64) for g in grids]))
    ell0 = ll(x.T) if callable(ll) else None
    shape = tuple(len(g) for g in grids)
    return jnp.asarray(np.asarray(ell0).reshape(shape), jnp.float32)


def sa_throughput(T, x0, k1=50, k2=250):
    from benchmarks.timing import marginal_time
    return marginal_time(T, x0, k1, k2)


def newton_step_time(T, x0):
    res = solve(T, x0, method="newton", tol=1e-12, max_iter=1)
    jax.block_until_ready(res.x)           # compile + first step
    t0 = time.perf_counter()
    res = solve(T, res.x, method="newton", tol=1e-12, max_iter=1)
    jax.block_until_ready(res.x)
    return time.perf_counter() - t0


def f64_residual(T64, ell):
    # On the CPU backend: the TPU's "f64" is an f32-exponent-range
    # double-float emulation, which underflows the wide discrete grids'
    # intermediates — true IEEE f64 lives on the host.
    cpu = jax.devices("cpu")[0]
    ell64 = jax.device_put(jnp.asarray(np.asarray(ell), jnp.float64), cpu)
    out = jax.jit(T64, device=cpu)(ell64)
    return float(jnp.max(jnp.abs(out - ell64)))


def _tpu_keepalive(stop_event, period_s=60.0):
    """Ping the accelerator with a tiny op while the host is busy.

    The axon TPU tunnel has dropped after long device-idle stretches
    (observed: worker unreachable right after a ~8-minute host-CPU f64
    polish), killing every later case in the run.  A trivial reduction
    every minute keeps the connection warm; errors are swallowed — if
    the worker is already down the main thread's next device op reports
    it properly.
    """
    dev = jax.devices()[0]
    while not stop_event.wait(period_s):
        try:
            jax.device_put(jnp.ones(3), dev).sum().block_until_ready()
        except Exception:
            pass


def f64_polish(entry, T64, x_f32, tol=1e-9, max_iter=6):
    """Host-CPU float64 Newton refine from the f32 solution — the
    two-stage recipe of ``wc_ratio_{continuous,discrete}(polish=True)``
    — recording seconds / iterations / final f64 residual in ``entry``."""
    import threading
    cpu = jax.devices("cpu")[0]
    x64 = jax.device_put(jnp.asarray(np.asarray(x_f32), jnp.float64), cpu)
    stop = threading.Event()
    ka = threading.Thread(target=_tpu_keepalive, args=(stop,), daemon=True)
    ka.start()
    try:
        with jax.default_device(cpu):
            t0 = time.perf_counter()
            pres = solve(T64, x64, method="newton", tol=tol,
                         max_iter=max_iter, jit=True)
            pres.x.block_until_ready()
            entry["polish_seconds_cpu_f64"] = round(
                time.perf_counter() - t0, 2)
    finally:
        stop.set()
        ka.join(timeout=120)
    entry["polish_iterations"] = int(pres.iterations)
    entry["polish_residual_f64"] = float(pres.residual)
    return pres.x


def run_case(name, T, T64, ell_init, n_points, tol):
    entry = {"name": name, "points": n_points, "kernel_mode": T.mode,
             "strips": list(T.strip_sizes), "tol": tol}
    dt = sa_throughput(T, ell_init)
    entry["sa_ms_per_iter"] = round(dt * 1e3, 3)
    entry["sa_G_point_updates_per_s"] = round(n_points / dt / 1e9, 2)
    entry["newton_step_s"] = round(newton_step_time(T, ell_init), 3)
    # Cap the outer loop: on wide discrete grids the f32 iteration floor
    # can sit above tol, and an uncapped loop would spin at the floor.
    t0 = time.perf_counter()
    res = solve(T, ell_init, method="newton", tol=tol, max_iter=60)
    jax.block_until_ready(res.x)
    entry["newton_solve_s"] = round(time.perf_counter() - t0, 2)
    entry["newton_iterations"] = int(res.iterations)
    entry["residual_f32"] = float(res.residual)
    entry["converged"] = bool(res.converged)
    entry["residual_f64_check"] = f64_residual(T64, res.x)
    return entry, res.x


def _flush(out, replace=False):
    """Merge the cases recorded so far into NORTHSTAR.json by name.

    Called after EVERY case: the axon TPU worker can crash mid-run
    (observed repeatedly at 10^7-point scale), and a trailing-only write
    would lose every completed case with it.

    ``replace=True`` (the final flush of a successful full run) drops
    cases not produced this run, so renamed/removed cases cannot linger
    as stale numbers.  The write is atomic (temp file + os.replace) and
    a corrupt existing file is treated as absent rather than bricking
    every later run at its first flush.
    """
    import os

    path = pathlib.Path(__file__).resolve().parent.parent / "NORTHSTAR.json"
    merged = out
    if path.exists() and not replace:
        try:
            old = json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            old = {}
        keep = [c for c in old.get("cases", [])
                if all(c["name"] != n["name"] for n in out["cases"])]
        merged = dict(old, cases=keep + out["cases"],
                      device=out["device"],
                      reference_largest_recorded_points=160_000)
    tmp = path.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(merged, indent=1) + "\n")
    os.replace(tmp, path)
    print(f"wrote {path}")


def main(which=("continuous", "discrete")):
    model = SSY()
    out = {"device": str(jax.devices()[0]).split(":")[0],
           "reference_largest_recorded_points": 160_000,
           "cases": []}

    if "continuous" in which:
        # Continuous (factored Gauss-Hermite quadrature, pre-power interp).
        n_points = int(np.prod(SHAPES_CONT))
        grids = build_grid_ssy(model, *SHAPES_CONT, num_std_devs=3.2)
        Tc = make_tiled_T_log_ssy_continuous(model, grids, degree=5)
        Tc64 = T_ssy_continuous_factory(model, grids, method="quadrature",
                                        interp="pre", space="log", jit=False)
        warm = loglinear_warm_start(model, grids)
        entry, x_f32 = run_case("ssy_continuous_quadrature_pre", Tc, Tc64,
                                warm, n_points, TOL_CONT)
        entry["shapes"] = list(SHAPES_CONT)
        # Full-accuracy polish: float64 Newton on host CPU from the f32
        # solution — ~4 Newton iterations to ~5e-11, i.e. reference-grade
        # 1e-7 accuracy at 10^7 points end to end.  Honest cost: the host
        # f64 stage is minutes, not seconds, at 11.2M points (each inner
        # BiCGStab matvec is a full CPU operator application).
        # Flush the finished f32 metrics BEFORE the polish: the host-f64
        # stage is the documented crash window (multi-minute device idle
        # has dropped the tunnel), and losing the completed f32 solve
        # with it would defeat the per-case flushing.
        out["cases"].append(entry)
        _flush(out)
        f64_polish(entry, Tc64, x_f32)
        print(json.dumps(entry))
        _flush(out)

    if "discrete" in which:
        # Discrete tensor grid at 10^7 points via TAUCHEN discretization:
        # its grid spans a fixed ±3 unconditional std at ANY point count,
        # so the fine-grid f32 envelope matches the continuous case.
        # (Rouwenhorst ladders widen like ±sqrt(n-1) sigma: at 384 z
        # points the span is ±19.6 sigma and theta*(in-group log-w span)
        # blows past exp's f32 range — measured: even the baseline-
        # normalized operator leaves the envelope after one iteration,
        # because the log-linear baseline itself is ~4.4 log units off at
        # those corners.  Wide-Rouwenhorst stays the f64/CPU tier; Tauchen
        # is the TPU-native discretization for fine discrete grids.)
        n_points = int(np.prod(SHAPES_DISC))
        disc = discretize_ssy(model, SHAPES_DISC, method="tauchen")
        Td = make_tiled_T_log_ssy(model, disc)
        Td64 = T_ssy_factory(model, disc, space="log", jit=False)
        from sdfs_via_autodiff_tpu.operators.discrete_ssy import (
            _ssy_normalized_arrays)
        arrs = _ssy_normalized_arrays(model, disc)
        warm = jnp.asarray(
            arrs["A0"] + arrs["phi_l"][:, None, None, None]
            + arrs["phi_k"][None, :, None, None]
            + arrs["phi_i"][None, None, :, None]
            + arrs["psi_ij"][None, None, :, :], jnp.float32)
        entry, x_f32 = run_case("ssy_discrete_tauchen", Td, Td64, warm,
                                n_points, TOL_DISC)
        entry["shapes"] = list(SHAPES_DISC)
        # Stash the f32 solution so the device_polish case (often run as
        # its own process for crash isolation) can skip re-solving.
        np.save(_X32_STASH, np.asarray(x_f32))
        # Reference-default accuracy (tol 1e-7, solvers.py:16) at 12.6M
        # discrete points: host-f64 Newton polish from the f32 solution.
        # Flush f32 metrics before the crash-prone host-f64 stage (see
        # the continuous case).
        out["cases"].append(entry)
        _flush(out)
        f64_polish(entry, Td64, x_f32)
        print(json.dumps(entry))
        _flush(out)

    if "ssy_rouwenhorst" in which:
        # The wide-Rouwenhorst twin of the same grid: the z ladder spans
        # ±sqrt(383) sigma, which capped f32 until round 5.  Two fixes
        # opened it on the XLA normalized tier: construction-time
        # log-domain row normalization (the folded baseline factors
        # reach e^{+-hundreds} — a plain f32 cast made inf/0 entries)
        # and lse_matmul's deep second matmul window (ladder-corner rows
        # sit ~theta*4.4 ~ -167 nats below their slice max, past the
        # single ~87-nat window).  The Pallas two-phase tier still
        # refuses-by-warning upfront (its joint column-group shifts
        # cannot window per row); record that alongside the real solve.
        import warnings as _warnings
        n_points = int(np.prod(SHAPES_DISC))
        from sdfs_via_autodiff_tpu.operators.two_phase import (
            two_phase_operands_ssy)
        from sdfs_via_autodiff_tpu.operators.discrete_ssy import (
            T_ssy_factory as _Tssyf)
        disc_r = discretize_ssy(model, SHAPES_DISC)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            two_phase_operands_ssy(model, disc_r, None)
        msgs = [str(w.message) for w in caught]
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            Tr32 = _Tssyf(model, disc_r, space="log",
                          baseline="loglinear", dtype=jnp.float32)
        xr0 = jnp.asarray(Tr32.baseline_log_w, jnp.float32)
        newton_attempt = None
        t0 = time.perf_counter()
        res = solve(Tr32, xr0, method="newton", tol=3e-5, max_iter=25,
                    inner_maxiter=12)
        jax.block_until_ready(res.x)
        algo = "newton(bicgstab_mixed)"
        if not bool(res.converged):
            # Keep the failed attempt on the record (this case monitors
            # the multi-window tangent at scale — round 5 found the
            # single-window tangent zeroing ladder-corner Jacobian rows,
            # which degraded those rows to SA-rate convergence and
            # stalled Newton at residual 0.13).
            newton_attempt = {
                "seconds": round(time.perf_counter() - t0, 1),
                "iterations": int(res.iterations),
                "residual_f32": float(res.residual)}
            t0 = time.perf_counter()
            res = solve(Tr32, xr0, method="anderson", tol=3e-5,
                        max_iter=3000)
            jax.block_until_ready(res.x)
            algo = "anderson"
        entry = {
            "name": "ssy_discrete_rouwenhorst",
            "points": n_points, "shapes": list(SHAPES_DISC),
            "kernel_mode": "xla_normalized", "tol": 3e-5,
            "algorithm": algo,
            "solve_s": round(time.perf_counter() - t0, 1),
            "iterations": int(res.iterations),
            "residual_f32": float(res.residual),
            "converged": bool(res.converged),
            "pallas_tier_upfront_envelope_warning": bool(msgs),
            "note": "wide-Rouwenhorst (z spans ±19.6 sigma) in f32 on "
                    "the XLA normalized tier via log-domain row "
                    "normalization + deep_window (round 5); the Pallas "
                    "two-phase tier still warns upfront and Tauchen "
                    "remains the fast-kernel discretization."}
        if newton_attempt is not None:
            entry["newton_attempt_failed"] = newton_attempt
        Tr64 = _Tssyf(model, disc_r, space="log", baseline="loglinear",
                      jit=False)
        entry["residual_f64_check"] = f64_residual(Tr64, res.x)
        out["cases"].append(entry)
        print(json.dumps(entry))
        _flush(out)

    if "gcy" in which:
        # Six-state GCY at 25.2M points: Tauchen's fixed ±3-sigma span
        # keeps theta = -36 inside the f32 envelope at any size (the
        # Rouwenhorst construction caps f32 six-state grids at ~1-2M).
        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy)
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory, gcy_loglinear_parts)
        gcy = GCY()
        big = (32, 16, 16, 12, 16, 16)
        n_points = int(np.prod(big))
        disc = discretize_gcy(gcy, big, dtype=jnp.float32, method="tauchen")
        Tg = make_tiled_T_log_gcy(gcy, disc)
        ell0 = jnp.asarray(gcy_loglinear_parts(gcy, disc)["ell0"],
                           jnp.float32)
        x0 = Tg.to_view(ell0).reshape((big[3], big[5],
                                       big[0] * big[1], big[2] * big[4]))
        t0 = time.perf_counter()
        res = solve(Tg.view_T, x0, method="newton", tol=2e-5, max_iter=40)
        jax.block_until_ready(res.x)
        entry = {"name": "gcy_discrete_tauchen", "points": n_points,
                 "shapes": list(big), "kernel_mode": Tg.mode,
                 "tol": 2e-5,
                 "newton_solve_s": round(time.perf_counter() - t0, 1),
                 "newton_iterations": int(res.iterations),
                 "residual_f32": float(res.residual),
                 "converged": bool(res.converged)}
        x_nat = Tg.from_view(res.x.reshape(
            (big[3], big[5], big[0], big[1], big[2], big[4])))
        disc64 = discretize_gcy(gcy, big, method="tauchen")
        Tg64 = T_gcy_factory(gcy, disc64, space="log", jit=False)
        entry["residual_f64_check"] = f64_residual(Tg64, x_nat)
        # Flush f32 metrics before the crash-prone host-f64 stage (see
        # the continuous case).
        out["cases"].append(entry)
        _flush(out)
        f64_polish(entry, Tg64, x_nat)
        print(json.dumps(entry))
        _flush(out)

    if "gcy_rouwenhorst" in which:
        # Wide-Rouwenhorst GCY in f32 at >=10M points via the normalized
        # per-axis XLA chain (the round-2 envelope cap was a property of
        # the Kronecker-grouped tiled kernel's joint column-group shifts,
        # not of the operator; reference construction
        # /root/reference/code/gcy/discrete/gcy_wc_ratio.py:109-120).
        # Newton with the mixed-precision BiCGStab (solvers/krylov.py):
        # vector-dtype BiCGStab broke down at this scale (f32 dot-product
        # noise collapsed rho/omega to a zero step, which forced this case
        # onto Anderson); f64 recurrence scalars remove the breakdown.
        # Anderson (f64 Gram solve) remains the recorded fallback if
        # Newton still stalls.
        import warnings as _warnings

        from sdfs_via_autodiff_tpu import GCY, discretize_gcy
        from sdfs_via_autodiff_tpu.operators.discrete_gcy import (
            T_gcy_factory)
        gcy = GCY()
        big = (32, 16, 16, 12, 16, 16)
        n_points = int(np.prod(big))
        with _warnings.catch_warnings():
            _warnings.simplefilter("ignore")
            disc = discretize_gcy(gcy, big)
            T32 = T_gcy_factory(gcy, disc, space="log",
                                baseline="loglinear", dtype=jnp.float32)
            x0 = jnp.asarray(T32.baseline_log_w, jnp.float32)
            newton_attempt = None
            t0 = time.perf_counter()
            # inner_maxiter=12: with the mixed-precision inner solver
            # actually iterating (instead of breaking down early), the
            # default 50-step cap means ~100 matvecs of the 25.2M-point
            # chain inside one device loop — a watchdog risk on the
            # fragile worker.  12 keeps Newton inexact-but-safeguarded.
            res = solve(T32, x0, method="newton", tol=3e-5, max_iter=25,
                        inner_maxiter=12)
            jax.block_until_ready(res.x)
            algo = "newton(bicgstab_mixed)"
            if not bool(res.converged):
                # Keep the failed attempt on the record: this case
                # exists to monitor the mixed-precision inner solver at
                # scale, so a silent fallback would hide its regression.
                newton_attempt = {
                    "seconds": round(time.perf_counter() - t0, 1),
                    "iterations": int(res.iterations),
                    "residual_f32": float(res.residual)}
                t0 = time.perf_counter()
                res = solve(T32, x0, method="anderson", tol=3e-5,
                            max_iter=3000)
                jax.block_until_ready(res.x)
                algo = "anderson"
        entry = {"name": "gcy_discrete_rouwenhorst_f32",
                 "points": n_points, "shapes": list(big),
                 "kernel_mode": "xla_normalized", "tol": 3e-5,
                 "algorithm": algo,
                 "solve_s": round(time.perf_counter() - t0, 1),
                 "iterations": int(res.iterations),
                 "residual_f32": float(res.residual),
                 "converged": bool(res.converged)}
        if newton_attempt is not None:
            entry["newton_attempt_failed"] = newton_attempt
        # dtype must be explicit: the normalized chain's working dtype
        # defaults to float32, which would make this "f64 check" rerun
        # the same f32-rounded folded factors the solve used.
        T64 = T_gcy_factory(gcy, disc, space="log", baseline="loglinear",
                            dtype=jnp.float64)
        entry["residual_f64_check"] = f64_residual(T64, res.x)
        out["cases"].append(entry)
        print(json.dumps(entry))
        _flush(out)

    if "gcy_continuous" in which:
        # Continuous six-state GCY at 18.9M points through the streamed
        # *pair* kernel (round-4: the conditioned z/z_pi expectation
        # matrices contract per-slice in VMEM — the one operator family
        # that had no fast tier; reference scale: ~50k points,
        # /root/reference/code/gcy/continuous/gcy_wc_ratio_continuous.py).
        # f32 recipe: coarse-fit ADDITIVE baseline — theta = -36 with
        # the closed-form log-linear baseline leaves theta*(residual
        # span) beyond exp's f32 range (the solution itself exits the
        # fold's envelope), while the ANOVA main effects of a coarse f64
        # solve leave only the non-separable remainder.
        from sdfs_via_autodiff_tpu import GCY
        from sdfs_via_autodiff_tpu.drivers import (_coarse_additive_baseline,
                                                   f32_tol_floor)
        from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
            make_tiled_T_log_gcy_continuous)
        from sdfs_via_autodiff_tpu.operators.continuous_gcy import (
            T_gcy_continuous_factory)
        from sdfs_via_autodiff_tpu.ops.grids import build_grid_gcy
        gcy = GCY()
        # (h_lam, h_c, h_z, h_zpi, z, z_pi): n_z = 128 lanes (the pair
        # kernel's layout constraint doubles as the z axis getting the
        # resolution), n_hlam % 8, (n_hz*n_hzpi) % 8.
        gbig = (16, 8, 12, 12, 128, 8)
        n_points = int(np.prod(gbig))
        t0 = time.perf_counter()
        baseline = _coarse_additive_baseline(
            gcy, gbig, num_std_devs=3.2, quad_degree=5, dtype=jnp.float64)
        coarse_s = time.perf_counter() - t0
        grids = build_grid_gcy(gcy, *gbig, num_std_devs=3.2)
        Tgc = make_tiled_T_log_gcy_continuous(gcy, grids, degree=5,
                                              baseline=baseline)
        x0 = Tgc.to_view(jnp.asarray(Tgc.baseline_log_w, jnp.float32)
                         ).reshape((gbig[1], gbig[0],
                                    gbig[2] * gbig[3], gbig[5] * gbig[4]))
        entry = {"name": "gcy_continuous_quadpre_pair", "points": n_points,
                 "shapes": list(gbig), "kernel_mode": Tgc.mode,
                 "engine": Tgc.engine, "tol": 1.2 * f32_tol_floor(gcy.theta),
                 "coarse_baseline_s": round(coarse_s, 1)}
        dt = sa_throughput(Tgc.view_T, x0)
        entry["sa_ms_per_iter"] = round(dt * 1e3, 3)
        entry["sa_G_point_updates_per_s"] = round(n_points / dt / 1e9, 2)
        out["cases"].append(entry)
        _flush(out)                       # ms/app survives a later crash
        # Successive approximation IS the solver for this operand class
        # (measured on TPU, 2026-08-19): the pair kernel costs ~3 ms per
        # 18.9M-point application and SA contracts at ~0.98/iter, so the
        # full solve is a few hundred device-resident iterations —
        # seconds.  Newton cannot beat that here: its inner matvecs run
        # through the XLA pair twin (~250 ms each), and 12 bounded
        # BiCGStab iterations under-resolve cond(I - T') ~ 1/(1-0.98),
        # so 25 safeguarded steps (180 s) moved the residual only
        # 0.059 -> 0.0425; Anderson's extrapolation left the coarse
        # additive baseline's f32 exp envelope and NaN-stopped at
        # iteration 22 (best-finite-iterate return, as designed).  The
        # kernel itself is exact: one-app sup vs host-f64 = 1.5e-6.
        t0 = time.perf_counter()
        res = solve(Tgc.view_T, x0, method="sa", tol=entry["tol"],
                    max_iter=2000)
        jax.block_until_ready(res.x)
        entry["sa_solve_s"] = round(time.perf_counter() - t0, 1)
        entry["sa_iterations"] = int(res.iterations)
        entry["residual_f32"] = float(res.residual)
        entry["converged"] = bool(res.converged)
        entry["algorithm"] = "sa"
        entry["note"] = ("SA at ~3 ms/application is the solver for "
                         "this class; Newton (XLA-twin tangent, bounded "
                         "inner) and Anderson (envelope exit) both "
                         "recorded non-viable at 18.9M — see "
                         "docs/scaling.md")
        if not entry["converged"]:
            # Anderson FROM the SA iterate (already near the solution,
            # so the extrapolation stays in the envelope) — fallback if
            # SA plateaus above tol.
            t0 = time.perf_counter()
            res = solve(Tgc.view_T, res.x, method="anderson",
                        tol=entry["tol"], max_iter=3000)
            jax.block_until_ready(res.x)
            entry["anderson_solve_s"] = round(time.perf_counter() - t0, 1)
            entry["anderson_iterations"] = int(res.iterations)
            entry["residual_f32"] = float(res.residual)
            entry["converged"] = bool(res.converged)
            entry["algorithm"] = "sa+anderson"
        out["cases"][-1] = entry
        _flush(out)
        # True-f64 residual of the f32 solution under the SAME
        # normalized operator semantics, on the host CPU.
        x_nat = Tgc.from_view(res.x.reshape(
            (gbig[1], gbig[0], gbig[2], gbig[3], gbig[5], gbig[4])))
        T64 = T_gcy_continuous_factory(
            gcy, grids, method="quadrature", interp="pre", space="log",
            quad_degree=5, baseline=baseline, jit=False)
        entry["residual_f64_check"] = f64_residual(T64, x_nat)
        print(json.dumps(entry))
        _flush(out)

    if "device_polish" in which:
        # On-device f64 refine (polish="device", drivers.py): the f32
        # tiled solve's warm start + Newton through the XLA operator in
        # the TPU's double-float "f64" emulation — array exp/log/matmul
        # ~1e-15, f32 range, which the log-space operator stays inside.
        # The host-CPU stage costs minutes at this size (see the
        # discrete case's polish_seconds_cpu_f64); this measures the
        # on-device alternative end to end, with the final residual
        # still checked in TRUE f64 on the host.
        import os
        n_points = int(np.prod(SHAPES_DISC))
        disc = discretize_ssy(model, SHAPES_DISC, method="tauchen")
        Td64 = T_ssy_factory(model, disc, space="log", jit=False)
        Td = make_tiled_T_log_ssy(model, disc)
        if os.path.exists(_X32_STASH):
            x_f32 = jnp.asarray(np.load(_X32_STASH), jnp.float32)
        else:
            # No stash from a prior 'discrete' case run: solve fresh.
            from sdfs_via_autodiff_tpu.operators.discrete_ssy import (
                _ssy_normalized_arrays)
            arrs = _ssy_normalized_arrays(model, disc)
            warm = jnp.asarray(
                arrs["A0"] + arrs["phi_l"][:, None, None, None]
                + arrs["phi_k"][None, :, None, None]
                + arrs["phi_i"][None, None, :, None]
                + arrs["psi_ij"][None, None, :, :], jnp.float32)
            res32 = solve(Td, warm, method="newton", tol=TOL_DISC,
                          max_iter=60)
            jax.block_until_ready(res32.x)
            x_f32 = res32.x
        x64 = jnp.asarray(x_f32, jnp.float64)       # default device
        # Mixed-precision iterative refinement (round-5): the inner
        # Krylov correction runs through the f32 tiled kernel's tangent
        # (newton_solver's tangent_T); residual + safeguard stay on the
        # emulated-f64 chain.  Round-4's all-f64 inner loop measured
        # 215 s here; the f32 inner matvec is ~50x cheaper.
        t0 = time.perf_counter()
        pres = solve(Td64, x64, method="newton", tol=1e-9, max_iter=6,
                     tangent_T=Td, jit=True)
        jax.block_until_ready(pres.x)
        entry = {"name": "ssy_discrete_tauchen_device_polish",
                 "points": n_points, "shapes": list(SHAPES_DISC),
                 "device_polish_seconds": round(time.perf_counter() - t0, 2),
                 "device_polish_iterations": int(pres.iterations),
                 "device_polish_residual_emulated_f64":
                     float(pres.residual),
                 "residual_true_f64_check": f64_residual(Td64, pres.x),
                 "inner_tangent": "f32 tiled kernel (tangent_T "
                                  "iterative refinement)",
                 "note": "f64 stage on the TPU double-float emulation "
                         "(polish='device'); compare "
                         "polish_seconds_cpu_f64 in ssy_discrete_tauchen"}
        out["cases"].append(entry)
        print(json.dumps(entry))
        _flush(out)

    if set(which) >= set(ALL_CASES):
        # Successful FULL run: rewrite wholesale so renamed/removed
        # cases cannot linger as stale numbers (partial runs merge).
        _flush(out, replace=True)


if __name__ == "__main__":
    import sys
    main(tuple(sys.argv[1:]) or ALL_CASES)
