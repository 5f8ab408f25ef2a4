"""Compute-roofline model for the streamed two-phase kernels (TPU).

BENCH_r04 established that the 11.2M-point streamed SSY tier is
compute-bound, not HBM-bound (DMA floor 0.22 ms vs ~1.2-1.5 ms
measured), so "% of HBM roofline" (14-29%) understates how close the
kernel is to the hardware's limit.  Round-4 VERDICT weak #4 asked for
the honest frame: publish a *compute* roofline with the op model
written down.  This script is that model, self-calibrated on the chip:

1. **Microbenchmarks** (per-element VPU costs, measured inside one XLA
   fusion so HBM traffic does not pollute them): chained applications
   of the kernels' own transcendental implementations
   (``ops/accurate``'s faithfully-rounded ``exp``/``log``/``log1p``,
   the hardware ``jnp.exp``/``jnp.log``) and a fused multiply-add
   chain.  Marginal cost = (t(k2-chain) - t(k1-chain)) / (k2 - k1)
   per element; the fma chain's cost is subtracted from the
   transcendental chains (each chain step carries one fma of range
   control).
2. **Matmul rates** at the kernels' ACTUAL contraction shapes (minor
   dims < 128 waste MXU lanes, so a peak-FLOPs number would be
   dishonest): lead-merged ``(N/I, I) @ (I, I)`` for each contracted
   axis size of the north-star grids.
3. **The op model** (`streamed_deferred_floor`): per grid point per
   application the deferred-c2 LSE path does 3 exp + 2 log + 1 log1p
   (pass B: exp in / log out; pass C: exp into the z contraction,
   log out of the row chain, the ``1 + beta e^{lh/theta}`` epilogue's
   exp + log1p) plus ~15 cheap elementwise ops (theta scale, baseline
   subs, shift adds, two low-rank rescale muls, max trees, epilogue
   fma) and ``2 (L + K + I + J)`` matmul FLOPs (one contraction per
   axis — the factored chain's exact FLOP count; the per-axis maxes
   and low-rank shift exps are O(N/axis) and ignored).  Memory floor:
   4 f32 field passes (B: read+write, C: read+write) = 16 B/point.

   floor_ms = max(compute_ms, dma_ms);   compute and DMA overlap on
   v5e (double-buffered pallas pipelines), so max() — not sum — is the
   roofline convention.

Writes COMPUTE_ROOFLINE.json (the calibration constants + the floors
for the north-star shapes at each transcendental tier).
``benchmarks/suite.py`` reads it to annotate the streamed rows with
``pct_of_compute_roofline``.

Usage: python benchmarks/compute_roofline.py   (run alone on the TPU)
"""

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from benchmarks.timing import HBM_GBPS, sync_scalar

# Elementwise non-transcendental ops per point per application in the
# deferred-c2 LSE path (counted from kernels/streamed_two_phase.py
# _b_kernel_deferred + _c_kernel(c2_deferred)): theta*ell (1), baseline
# row/col subs (2), pass-B shift sub (1) + shift add back (1), pass-C
# shift sub (1), two low-rank rescale muls (2), shift add (1), epilogue
# adds + lh/theta + beta mul (3), max trees (~3 compares amortized).
EW_OPS_PER_POINT = 15.0
FIELD_BYTES_PER_POINT = 16.0      # 4 f32 passes of the field


def _chain_cost_per_elem(step, n_elem=1 << 24, reps=5):
    """Marginal per-element seconds of one ``step`` application, timed
    as the difference of two fused ``fori_loop`` chains over an n_elem
    f32 array — intermediate values never touch HBM.

    Every timed call ends in ``sync_scalar`` (benchmarks/timing.py):
    the axon tunnel's ``block_until_ready`` can return before execution
    when the queue is deep, and the first committed calibration —
    4M-element unrolled chains, block-only timing — measured pure
    dispatch noise (negative per-element costs).  The fetch's constant
    ~40 ms latency cancels in the k2-k1 delta; the chain length adapts
    until the delta clears that constant's jitter."""
    @jax.jit
    def f(x, k):
        return lax.fori_loop(0, k, lambda i, v: step(v), x)

    x = jnp.linspace(0.1, 0.9, n_elem, dtype=jnp.float32)
    k1 = 8
    sync_scalar(f(x, k1))                      # compile + drain

    def t(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync_scalar(f(x, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = t(k1)
    k2 = 512
    while True:
        d = t(k2) - t1
        if d > 0.05 or k2 >= 1 << 16:
            return d / (k2 - k1) / n_elem
        k2 *= 4


def _matmul_rate(rows, n, reps=5):
    """Measured FLOP/s of the lead-merged (rows, n) @ (n, n) f32 dot —
    the kernels' per-axis contraction shape (HIGHEST precision, like
    the kernels' _dot_p default).  Same sync-scalar + adaptive-chain
    protocol as _chain_cost_per_elem.  The dot result is rescaled each
    step to keep the carry finite over long chains."""
    a = jnp.asarray(np.random.default_rng(0).standard_normal(
        (rows, n)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(
        (n, n)), jnp.float32)
    scale = jnp.float32(1.0 / (4.0 * np.sqrt(n)))

    @jax.jit
    def f(x, wm, k):
        def body(i, v):
            return jax.lax.dot(v, wm,
                               precision=jax.lax.Precision.HIGHEST) * scale
        return lax.fori_loop(0, k, body, x)

    k1 = 4
    sync_scalar(f(a, w, k1))

    def t(k):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync_scalar(f(a, w, k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = t(k1)
    k2 = 64
    while True:
        d = t(k2) - t1
        if d > 0.05 or k2 >= 1 << 14:
            return 2.0 * rows * n * n * (k2 - k1) / d
        k2 *= 4


def calibrate():
    """Measure the per-element/per-FLOP constants on the active chip."""
    from sdfs_via_autodiff_tpu.ops.accurate import (
        exp_f32 as _aexp, log_f32 as _alog, log1p_f32 as _alog1p)

    fma = _chain_cost_per_elem(lambda x: x * 0.9999 + 1e-3)
    # Each transcendental chain step carries one fma of range control;
    # subtract its measured cost.
    c = {
        "fma_s": fma,
        "exp_accurate_s": _chain_cost_per_elem(
            lambda x: _aexp(x * -0.25 - 0.5)) - fma,
        "log_accurate_s": _chain_cost_per_elem(
            lambda x: _alog(x * 0.5 + 1.5)) - fma,
        "log1p_accurate_s": _chain_cost_per_elem(
            lambda x: _alog1p(x * 0.5)) - fma,
        "exp_hw_s": _chain_cost_per_elem(
            lambda x: jnp.exp(x * -0.25 - 0.5)) - fma,
        "log_hw_s": _chain_cost_per_elem(
            lambda x: jnp.log(x * 0.5 + 1.5)) - fma,
        "log1p_hw_s": _chain_cost_per_elem(
            lambda x: jnp.log1p(x * 0.5)) - fma,
    }
    # A non-positive marginal cost is a measurement failure (dispatch
    # noise swamped the chain delta), never physics: refuse to write a
    # calibration that would make the roofline claim nonsense.
    bad = {k: v for k, v in c.items() if v <= 0}
    if bad:
        raise RuntimeError(f"noise-dominated calibration: {bad}; "
                           "increase chain length / reps")
    return c


def tier_costs(c, transcendentals):
    """(exp, log, log1p) per-element seconds for a _TRX tier name."""
    if transcendentals == "accurate":
        return (c["exp_accurate_s"], c["log_accurate_s"],
                c["log1p_accurate_s"])
    if transcendentals == "mixed":          # hw exp + accurate log
        return (c["exp_hw_s"], c["log_accurate_s"], c["log1p_accurate_s"])
    return (c["exp_hw_s"], c["log_hw_s"], c["log1p_hw_s"])   # fast


def streamed_deferred_floor(shapes, c, mm_rates, transcendentals):
    """Model floor (seconds per application) for the deferred-c2 LSE
    streamed path on a (L, K, I, J) grid.  See module docstring for the
    op counts."""
    L, K, I, J = shapes
    n = L * K * I * J
    e, lg, l1 = tier_costs(c, transcendentals)
    compute = n * (3 * e + 2 * lg + 1 * l1 + EW_OPS_PER_POINT * c["fma_s"])
    for ax in (L, K, I, J):
        compute += 2.0 * n * ax / mm_rates[ax]
    dma = n * FIELD_BYTES_PER_POINT / (HBM_GBPS * 1e9)
    return {"compute_s": compute, "dma_s": dma,
            "floor_s": max(compute, dma)}


def main():
    assert jax.default_backend() != "cpu", \
        "calibration must run on the TPU"
    out = {"device": str(jax.devices()[0]).split(":")[0],
           "hbm_gbps": HBM_GBPS,
           "ew_ops_per_point": EW_OPS_PER_POINT,
           "field_bytes_per_point": FIELD_BYTES_PER_POINT}
    c = calibrate()
    out["calibration"] = {k: float(f"{v:.4g}") for k, v in c.items()}
    print(json.dumps(out["calibration"]))

    # Matmul rates at the north-star axis sizes (rows = a representative
    # lead-merged height; rate is flat in rows once >= a few thousand).
    shapes_cont = (56, 56, 56, 64)
    shapes_disc = (32, 32, 32, 384)
    axes = sorted(set(shapes_cont) | set(shapes_disc))
    # Small contracted axes need taller stacks for the chain delta to
    # clear the dispatch noise (per-dot FLOPs scale with n^2).
    mm = {ax: _matmul_rate(1 << (19 if ax < 128 else 17), ax)
          for ax in axes}
    if any(r <= 0 for r in mm.values()):
        raise RuntimeError(f"noise-dominated matmul rates: {mm}")
    out["matmul_gflops_by_axis"] = {str(ax): round(r / 1e9, 1)
                                    for ax, r in mm.items()}
    print(json.dumps(out["matmul_gflops_by_axis"]))

    out["floors"] = {}
    for name, shp in (("ssy_continuous_56x56x56x64", shapes_cont),
                      ("ssy_discrete_32x32x32x384", shapes_disc)):
        n = int(np.prod(shp))
        for tier in ("accurate", "mixed", "fast"):
            fl = streamed_deferred_floor(shp, c, mm, tier)
            out["floors"][f"{name}_{tier}"] = {
                "points": n,
                "compute_ms": round(fl["compute_s"] * 1e3, 3),
                "dma_ms": round(fl["dma_s"] * 1e3, 3),
                "floor_ms": round(fl["floor_s"] * 1e3, 3)}
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "COMPUTE_ROOFLINE.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}")
    print(json.dumps(out["floors"], indent=1))


def pct_of_compute_roofline(shapes, dt_s, transcendentals="accurate",
                            root=None):
    """suite.py hook: % of the modelled compute floor achieved by a
    measured per-application time, using the committed calibration.
    Returns None when COMPUTE_ROOFLINE.json is absent (model not yet
    calibrated on this chip generation)."""
    root = root or pathlib.Path(__file__).resolve().parent.parent
    path = pathlib.Path(root) / "COMPUTE_ROOFLINE.json"
    if not path.exists():
        return None
    data = json.loads(path.read_text())
    c = data["calibration"]
    mm = {int(k): v * 1e9
          for k, v in data["matmul_gflops_by_axis"].items()}
    for ax in shapes:
        if ax not in mm:
            return None
    fl = streamed_deferred_floor(tuple(shapes), c, mm, transcendentals)
    return round(100.0 * fl["floor_s"] / dt_s, 1)


if __name__ == "__main__":
    main()
