"""Shared marginal-timing helper for the benchmark scripts.

Single-call timings through the axon TPU tunnel measure ~1 ms of RPC
dispatch, not device time (docs/status.md #5), so every throughput
number in bench.py / benchmarks/suite.py / benchmarks/northstar.py uses
the same two-point method: time a jitted fori-loop of k1 applications
and one of k2, take (t(k2) - t(k1)) / (k2 - k1), min-of-reps each.
"""

import time

import jax
import jax.numpy as jnp
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


def sync_scalar(r):
    """Force a device->host roundtrip that depends on ``r``.

    ``block_until_ready`` through the axon tunnel can return before the
    enqueued work has actually executed when the dispatch queue is deep
    (measured 2026-08-19: a warm 8-chain 8192^3 HIGHEST dot "blocked"
    in 0.11 ms, then a scalar fetch absorbed 20.4 s of backlog; once
    drained the same block took a physical 319 ms).  Fetching one
    element of the result is an unconditional sync.  Its ~40 ms tunnel
    latency is CONSTANT, so the two-point k2-k1 differencing below
    cancels it exactly."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def marginal_time(T, x0, k1, k2, reps=3):
    """Marginal per-application seconds of ``T`` at iterate ``x0``."""
    def mk(K):
        @jax.jit
        def many(x):
            return lax.fori_loop(0, K, lambda i, v: T(v), x)
        return many

    m1, m2 = mk(k1), mk(k2)
    sync_scalar(m1(x0))
    sync_scalar(m2(x0))

    def t(f):
        t0 = time.perf_counter()
        sync_scalar(f(x0))
        return time.perf_counter() - t0

    return (min(t(m2) for _ in range(reps))
            - min(t(m1) for _ in range(reps))) / (k2 - k1)
