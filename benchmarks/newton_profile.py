"""Newton-step attribution at the 11.2M-point north star (TPU).

Round-3 regen queue item: split one Newton-Kantorovich step into its
parts — linearize primal, inner BiCGStab matvecs (tangent through the
XLA twin), dispatch — and measure whether the twin_precision="3x" tier
(three-pass bf16 tangent matvecs, ops/contract.einsum_p) buys the
predicted ~2x on the inner solve.  Writes NEWTON_PROFILE.json.

Usage: python benchmarks/newton_profile.py  (run alone on the TPU; the
solver stall guards and the bounded inner loop keep it watchdog-safe).
"""

import json
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdfs_via_autodiff_tpu import SSY, solve
from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
    make_tiled_T_log_ssy_continuous)
from sdfs_via_autodiff_tpu.operators.continuous_ssy import build_grid_ssy
from benchmarks.northstar import SHAPES_CONT, loglinear_warm_start
from benchmarks.timing import marginal_time


def timed(fn, *args, n=5):
    jax.block_until_ready(fn(*args))          # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    model = SSY()
    grids = build_grid_ssy(model, *SHAPES_CONT, num_std_devs=3.2)
    n_points = int(np.prod(SHAPES_CONT))
    warm = loglinear_warm_start(model, grids)
    out = {"points": n_points, "shapes": list(SHAPES_CONT),
           "device": str(jax.devices()[0]).split(":")[0]}

    for tier in ("highest", "3x"):
        T = make_tiled_T_log_ssy_continuous(model, grids, degree=5,
                                            twin_precision=tier)
        rec = {}
        # 1. primal application (pallas kernel)
        rec["primal_ms_per_app"] = round(
            marginal_time(T, warm, 10, 40) * 1e3, 3)
        # 2. linearize primal: evaluates the twin once, storing tangent
        #    residuals — the per-Newton-step fixed cost.
        g = lambda x: T(x) - x

        def lin_primal(x):
            gx, _ = jax.linearize(g, x)
            return gx

        rec["linearize_primal_s"] = round(timed(jax.jit(lin_primal), warm),
                                          3)
        # 3. one tangent matvec (the unit of inner BiCGStab cost).
        gx, jvp_fn = jax.linearize(g, warm)
        v = 0.01 * jnp.ones_like(warm)

        def matvec(v_):
            return jvp_fn(v_)

        rec["tangent_matvec_ms"] = round(timed(jax.jit(matvec), v) * 1e3,
                                         3)
        # 4. one full cached Newton step (northstar's measurement).
        res = solve(T, warm, method="newton", tol=1e-12, max_iter=1)
        jax.block_until_ready(res.x)
        t0 = time.perf_counter()
        res = solve(T, res.x, method="newton", tol=1e-12, max_iter=1)
        jax.block_until_ready(res.x)
        rec["newton_step_s"] = round(time.perf_counter() - t0, 3)
        # 5. quality: full solve at the f32 tolerance.
        t0 = time.perf_counter()
        res = solve(T, warm, method="newton", tol=2e-5, max_iter=60)
        jax.block_until_ready(res.x)
        rec["newton_solve_s"] = round(time.perf_counter() - t0, 2)
        rec["iterations"] = int(res.iterations)
        rec["residual_f32"] = float(res.residual)
        rec["converged"] = bool(res.converged)
        out[f"twin_{tier}"] = rec
        print(json.dumps({tier: rec}))
        _flush(out)

    # GCY at the 25.2M-point north star (round-4 VERDICT weak #2: the
    # recorded solve spent ~9 s per Newton step with no attribution).
    # Same split per twin tier: is the floor the linearize (one twin
    # evaluation storing tangent residuals), the per-matvec tangent
    # chain, or compile amortization?
    from sdfs_via_autodiff_tpu import GCY, discretize_gcy
    from sdfs_via_autodiff_tpu.kernels.tiled_two_phase import (
        make_tiled_T_log_gcy)
    gcy = GCY()
    big = (32, 16, 16, 12, 16, 16)
    n_big = int(np.prod(big))
    disc = discretize_gcy(gcy, big, dtype=jnp.float32, method="tauchen")
    out["gcy"] = {"points": n_big, "shapes": list(big)}
    xg0 = None
    for tier in ("highest", "3x"):
        Tg = make_tiled_T_log_gcy(gcy, disc, twin_precision=tier)
        if xg0 is None:
            xg0 = Tg.to_view(jnp.full(big, jnp.log(300.0), jnp.float32)
                             ).reshape((big[3], big[5],
                                        big[0] * big[1],
                                        big[2] * big[4]))
        T = Tg.view_T
        rec = {}
        rec["primal_ms_per_app"] = round(
            marginal_time(T, xg0, 10, 40) * 1e3, 3)
        g = lambda x: T(x) - x

        def lin_primal(x):
            gx, _ = jax.linearize(g, x)
            return gx

        rec["linearize_primal_s"] = round(timed(jax.jit(lin_primal), xg0),
                                          3)
        gx, jvp_fn = jax.linearize(g, xg0)
        v = 0.01 * jnp.ones_like(xg0)
        rec["tangent_matvec_ms"] = round(
            timed(jax.jit(jvp_fn), v) * 1e3, 3)
        res = solve(T, xg0, method="newton", tol=1e-12, max_iter=1)
        jax.block_until_ready(res.x)
        t0 = time.perf_counter()
        res = solve(T, res.x, method="newton", tol=1e-12, max_iter=1)
        jax.block_until_ready(res.x)
        rec["newton_step_s"] = round(time.perf_counter() - t0, 3)
        out["gcy"][f"twin_{tier}"] = rec
        print(json.dumps({f"gcy_{tier}": rec}))
        _flush(out)
    print("wrote NEWTON_PROFILE.json")


def _flush(out):
    path = pathlib.Path(__file__).resolve().parent.parent / \
        "NEWTON_PROFILE.json"
    path.write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
