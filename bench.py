"""Headline benchmark: discrete SSY operator throughput, factored vs
reference-style broadcast formulation, on the local accelerator.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

* Workload: 200 successive-approximation applications of the discrete SSY
  Koopmans operator on an (8,8,8,8) Rouwenhorst grid in log space at f64,
  as one device-resident loop.  (8,8,8,8) is the largest grid the baseline
  formulation can run on this chip at all: at the reference's own
  (10,10,10,10) Newton configuration (``sandpit.ipynb``) the broadcast
  formulation exhausts 15.75 GB of HBM even for plain iteration, while the
  factored operator at (10,10,10,10) needs ~80 KB per field.
* ``value``: this framework's throughput in grid-point updates per second
  (N * iters / seconds, median of 3 timed runs, compile excluded).
* ``vs_baseline``: speedup over the reference's broadcast-H formulation
  (reimplemented in ``benchmarks/reference_style.py``) running the
  identical loop on the same chip.  Note the baseline already gets two
  fixes for free: the log-space transform (without which the reference
  formulation cannot run on TPU at all — w^theta ~ 1e-47 underflows the
  f32-range f64 emulation) and this grid downsizing.

Correctness gate: one application of each operator must agree to 1e-10
(the factored operator itself is validated against loop oracles, a dense-H
path, and end-to-end solves in tests/).
"""

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

SHAPES = (8, 8, 8, 8)
ITERS = 200

_REPO = os.path.dirname(os.path.abspath(__file__))
LASTGOOD_PATH = os.path.join(_REPO, "BENCH_LASTGOOD.json")


def median_time(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def load_last_good(root=_REPO):
    """Most recent successful headline record, or None.

    Primary source: BENCH_LASTGOOD.json, written by every successful
    bench run.  Fallback: scan the driver-committed BENCH_r*.json round
    artifacts for the newest non-null parsed record (covers a repo
    where the last-good file predates this mechanism)."""
    try:
        with open(os.path.join(root, os.path.basename(LASTGOOD_PATH))) as f:
            rec = json.load(f)
        if rec.get("value") is not None:
            return rec
    except (OSError, ValueError):
        pass
    best = None
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r[0-9]*.json"))):
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except (OSError, ValueError):
            continue
        if parsed.get("value") is not None:
            parsed.setdefault("recorded_at", "round artifact " +
                              os.path.basename(path))
            best = parsed            # sorted ascending: keep the newest
    return best


def emit_unreachable(reason, root=_REPO):
    """Emit the outage record: the last good measurement marked
    ``stale`` (so a worker outage never blanks a round artifact —
    round-3 VERDICT weak #1), or a neutral ``device_probe`` error when
    no last-good record exists (never borrow a real metric's name for
    a failure record).  Returns the chosen exit code."""
    rec = load_last_good(root)
    if rec is not None:
        out = dict(rec)
        out["stale"] = True
        out["stale_reason"] = reason
        out.setdefault("recorded_at", "unknown")
        print(json.dumps(out))
        return 0
    print(json.dumps({"metric": "device_probe", "value": None,
                      "unit": None, "vs_baseline": None,
                      "error": reason}))
    return 1


def save_last_good(record, root=_REPO):
    record = dict(record)
    record["recorded_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime())
    with open(os.path.join(root, os.path.basename(LASTGOOD_PATH)), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")


def _probe_device_or_die(timeout_s: float = None):
    """Fail fast when the accelerator is unreachable (the axon TPU
    worker has had multi-hour outages during which device ops hang in
    RPC retries forever — a hung bench emits nothing, which is worse
    than an honest record).  On timeout, emit the last good record
    with a staleness marker rather than a null value."""
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("SDFS_BENCH_PROBE_TIMEOUT", 600))
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            rc = emit_unreachable(
                f"device probe did not complete within {timeout_s:.0f}s "
                f"(accelerator unreachable)")
            os._exit(rc)

    threading.Thread(target=watchdog, daemon=True).start()
    jax.block_until_ready(jnp.ones(3).sum())
    done.set()


def _run_watchdog(timeout_s: float = None):
    """Deadline over the WHOLE benchmark run, not just the probe: the
    tunnel can drop mid-run (device ops then hang in RPC retries), and
    a hung bench emits nothing.  Returns the event to set on success."""
    import threading

    if timeout_s is None:
        timeout_s = float(os.environ.get("SDFS_BENCH_RUN_TIMEOUT", 3600))
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            rc = emit_unreachable(
                f"bench run did not complete within {timeout_s:.0f}s "
                f"(accelerator lost mid-run)")
            os._exit(rc)

    threading.Thread(target=watchdog, daemon=True).start()
    return done


def main():
    from sdfs_via_autodiff_tpu import SSY, discretize_ssy, T_ssy_factory, solve
    from benchmarks.reference_style import T_ssy_reference_style

    _probe_device_or_die()
    run_done = _run_watchdog()

    model = SSY()
    disc = discretize_ssy(model, SHAPES)
    ell0 = jnp.full(SHAPES, jnp.log(800.0))
    n_points = 1
    for s in SHAPES:
        n_points *= s

    T_fac = T_ssy_factory(model, disc, space="log")
    T_ref = T_ssy_reference_style(model, disc, space="log")

    # Fixed-iteration-count loops (tol=0 never triggers).
    run_fac = lambda: solve(T_fac, ell0, method="successive_approx",
                            tol=0.0, max_iter=ITERS).x
    run_ref = lambda: solve(T_ref, ell0, method="successive_approx",
                            tol=0.0, max_iter=ITERS).x

    # Correctness gate: the two formulations compute the same operator.
    err = float(jnp.max(jnp.abs(T_fac(ell0) - T_ref(ell0))))
    if not err < 1e-10:
        print(json.dumps({"metric": "ssy_discrete_T_throughput",
                          "value": None, "unit": "grid-point-updates/s",
                          "vs_baseline": None,
                          "error": f"fixed points differ by {err}"}))
        sys.exit(1)

    jax.block_until_ready(run_fac())   # compile
    jax.block_until_ready(run_ref())
    t_fac = median_time(run_fac)
    t_ref = median_time(run_ref)

    # Scale metric: tiled two-phase Pallas operator at a 10^7-point grid
    # (the north-star scale; the reference's largest recorded run is
    # 160k points).  Marginal two-point timing cancels dispatch overhead.
    scale = _scale_metric()

    record = {
        "metric": "ssy_discrete_T_throughput_8^4_logspace_f64",
        "value": round(n_points * ITERS / t_fac),
        "unit": "grid-point-updates/s",
        "vs_baseline": round(t_ref / t_fac, 2),
        "ours_s_per_200_iters": round(t_fac, 4),
        "reference_formulation_s_per_200_iters": round(t_ref, 4),
        "one_application_sup_diff": err,
        "note": "baseline (reference broadcast formulation) OOMs 15.75GB HBM at the reference's 10^4 grid; 8^4 is its largest runnable size here",
        "backend": jax.default_backend(),
        **scale,
    }
    run_done.set()
    print(json.dumps(record))
    if jax.default_backend() != "cpu":
        save_last_good(record)


def _scale_metric(shapes=(56, 56, 56, 64)):
    """Streamed-kernel operator throughput at 11.2M points (f32,
    marginal): the accurate default (precision="3x", one-application
    error 2.3e-6 vs f64) plus the throughput mode (bf16 matmuls +
    hardware transcendentals, ~8e-4).

    Hardware attribution (round 3, docs/status.md): at this size the
    operator is COMPUTE-bound on v5e, not HBM-bound — accurate
    transcendentals ~0.3-0.4 ms, matmul emulation passes ~0.35 ms,
    in-VMEM transposes ~0.25 ms vs a 0.22 ms 4-pass DMA floor — so the
    "% of HBM roofline" figure understates how close the kernel runs to
    its real (compute) roofline.
    """
    import warnings

    from benchmarks.timing import hbm_roofline_pct, marginal_time
    from benchmarks.compute_roofline import pct_of_compute_roofline
    from sdfs_via_autodiff_tpu import SSY, discretize_ssy
    from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
        make_streamed_T_log)
    from sdfs_via_autodiff_tpu.operators.two_phase import (
        two_phase_operands_ssy)

    if jax.default_backend() == "cpu":
        return {}
    try:
        model = SSY()
        disc = discretize_ssy(model, shapes)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ops = two_phase_operands_ssy(model, disc, None)
        n = 1
        for s in shapes:
            n *= s
        ell0 = jnp.full(shapes, jnp.log(800.0), jnp.float32)

        dt = marginal_time(make_streamed_T_log(ops), ell0, 50, 200)
        dt_mixed = marginal_time(
            make_streamed_T_log(ops, transcendentals="mixed"),
            ell0, 50, 200)
        dt_fast = marginal_time(
            make_streamed_T_log(ops, precision="default",
                                transcendentals="fast"), ell0, 50, 200)
        # 4 HBM passes of the f32 field per application (2 per phase).
        from benchmarks.timing import effective_gbps
        bw = effective_gbps(n, dt)
        return {
            "scale_metric": "ssy_discrete_streamed_T_56x56x56x64_f32",
            "scale_points": n,
            "scale_ms_per_application": round(dt * 1e3, 3),
            "scale_G_point_updates_per_s": round(n / dt / 1e9, 2),
            "scale_effective_GBps": round(bw),
            "scale_pct_of_hbm_roofline": round(hbm_roofline_pct(n, dt), 1),
            "scale_mixed_trx_ms_per_application": round(dt_mixed * 1e3, 3),
            "scale_mixed_trx_pct_of_hbm_roofline":
                round(hbm_roofline_pct(n, dt_mixed), 1),
            "scale_throughput_mode_ms_per_application":
                round(dt_fast * 1e3, 3),
            "scale_throughput_mode_pct_of_hbm_roofline":
                round(hbm_roofline_pct(n, dt_fast), 1),
            # The honest frame for a compute-bound kernel: % of the
            # self-calibrated VPU+MXU floor (benchmarks/
            # compute_roofline.py; None until COMPUTE_ROOFLINE.json has
            # been generated on this chip).
            "scale_pct_of_compute_roofline":
                pct_of_compute_roofline(shapes, dt, "accurate"),
            "scale_mixed_trx_pct_of_compute_roofline":
                pct_of_compute_roofline(shapes, dt_mixed, "mixed"),
            "scale_throughput_mode_pct_of_compute_roofline":
                pct_of_compute_roofline(shapes, dt_fast, "fast"),
            "scale_note": "compute-bound (VPU transcendentals + matmul "
                          "emulation), not HBM-bound; see docs/status.md",
        }
    except Exception as e:                     # pragma: no cover
        return {"scale_metric_error": str(e)[:200]}


if __name__ == "__main__":
    main()
