"""Grid-shape ablation for the streamed kernel's per-point throughput.

The streamed kernels' efficiency depends on how the grid shape maps to
Mosaic tiles: the c1 swap cost scales with the I (sublane) axis'
8-alignment, the c2/row dots with the J (lane) axis' 128-alignment, and
strip sizes with the column-group bytes.  The north-star grid
(56, 56, 56, 64) was chosen for its physics (±3σ Tauchen spans at 12.6M
points), not its tiling; this tool measures whether a tile-aligned
reshape of the same point budget buys throughput.

Usage (TPU, one process at a time):

    python benchmarks/shape_ablation.py            # default candidates
    python benchmarks/shape_ablation.py 56,56,56,64 64,64,48,64

Prints one JSON line per shape: ms/application (marginal), G point
updates/s, and pct of the 4-pass HBM roofline — the headline metric's
normalization, so results are directly comparable across shapes.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CANDIDATES = [
    (56, 56, 56, 64),     # north-star grid (11.2M)
    (56, 56, 64, 64),     # I lane-cleaner column group (12.8M, C=4096)
    (64, 56, 56, 64),     # bigger row block, same columns (12.8M)
    (64, 64, 48, 64),     # 8-aligned rows, I=48 (12.6M)
    (48, 48, 64, 128),    # J=128: lane-exact c2/row dots (18.9M)
    (32, 32, 64, 128),    # J=128 at 8.4M
]


def measure(shapes, warm=50, iters=200):
    import warnings

    from benchmarks.timing import HBM_GBPS, marginal_time
    from sdfs_via_autodiff_tpu import SSY, discretize_ssy
    from sdfs_via_autodiff_tpu.kernels.streamed_two_phase import (
        make_streamed_T_log, streamed_supported)
    from sdfs_via_autodiff_tpu.operators.two_phase import (
        two_phase_operands_ssy)

    model = SSY()
    disc = discretize_ssy(model, shapes, method="tauchen")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ops = two_phase_operands_ssy(model, disc, None)
    n = int(np.prod(shapes))
    entry = {"shapes": list(shapes), "points": n}
    if not streamed_supported(ops):
        entry["skipped"] = "not streamed-coverable"
        return entry
    ell0 = jnp.full(shapes, jnp.log(800.0), jnp.float32)
    for label, kw in [("accurate", {}),
                      ("throughput", dict(precision="default",
                                          transcendentals="fast"))]:
        T = make_streamed_T_log(ops, **kw)
        dt = marginal_time(T, ell0, warm, iters)
        bw = 4 * n * 4 / dt / 1e9
        entry[label] = {
            "ms_per_application": round(dt * 1e3, 3),
            "G_point_updates_per_s": round(n / dt / 1e9, 2),
            "pct_of_hbm_roofline": round(100 * bw / HBM_GBPS, 1)}
    return entry


def main(argv):
    cands = ([tuple(int(v) for v in a.split(",")) for a in argv]
             if argv else DEFAULT_CANDIDATES)
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0]).split(":")[0]}))
    for shapes in cands:
        t0 = time.perf_counter()
        try:
            entry = measure(shapes)
        except Exception as e:                     # pragma: no cover
            entry = {"shapes": list(shapes), "error": str(e)[:200]}
        entry["total_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
