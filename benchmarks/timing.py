"""Shared marginal-timing helper for the benchmark scripts.

Single-call timings through the axon TPU tunnel measure ~1 ms of RPC
dispatch, not device time (docs/status.md #5), so every throughput
number in bench.py / benchmarks/suite.py / benchmarks/northstar.py uses
the same two-point method: time a jitted fori-loop of k1 applications
and one of k2, take (t(k2) - t(k1)) / (k2 - k1), min-of-reps each.
"""

import time

import jax
from jax import lax

# v5e HBM bandwidth roofline (GB/s); the streamed kernels move 4 f32
# passes of the field per application (2 per phase).  Single source for
# every "% of HBM roofline" figure in bench.py / suite.py /
# shape_ablation.py — change HERE for another TPU generation.
HBM_GBPS = 819.0


def effective_gbps(n_points, dt_s, passes=4, bytes_per=4):
    return passes * n_points * bytes_per / dt_s / 1e9


def hbm_roofline_pct(n_points, dt_s, passes=4, bytes_per=4):
    return 100.0 * effective_gbps(n_points, dt_s, passes, bytes_per) / HBM_GBPS


def marginal_time(T, x0, k1, k2, reps=3):
    """Marginal per-application seconds of ``T`` at iterate ``x0``."""
    def mk(K):
        @jax.jit
        def many(x):
            return lax.fori_loop(0, K, lambda i, v: T(v), x)
        return many

    m1, m2 = mk(k1), mk(k2)
    jax.block_until_ready(m1(x0))
    jax.block_until_ready(m2(x0))

    def t(f):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x0))
        return time.perf_counter() - t0

    return (min(t(m2) for _ in range(reps))
            - min(t(m1) for _ in range(reps))) / (k2 - k1)
