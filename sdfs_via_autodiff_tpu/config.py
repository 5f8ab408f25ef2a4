"""Global configuration: precision policy and platform detection.

The reference code forces 64-bit floats at import time in every JAX file
(reference ``code/solvers.py:9-11``, ``code/ssy/discrete/ssy_wc_ratio.py:19-20``,
``code/ssy/continuous_junnan/ssy_wc_ratio_continuous.py:17``).  We keep that
behaviour — x64 is *enabled* so float64 arrays are representable — but unlike
the reference we make the working dtype an explicit argument everywhere, since
on TPU float32 (with the log-space operator formulation) is the fast path and
float64 is an emulated parity/polish path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Enable 64-bit support once, at package import.  This only widens the set of
# representable dtypes; code below always passes dtypes explicitly.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: TPU compiles of the solver loops run
# minutes through this environment's remote-compile service; caching them
# across processes cuts repeat launches ~3x (measured).  Opt out with
# SDFS_TPU_NO_COMPILE_CACHE=1.
if not os.environ.get("SDFS_TPU_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "SDFS_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sdfs_tpu_jax"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def default_dtype() -> jnp.dtype:
    """Default working dtype.

    float64 everywhere: it is exact parity with the reference (which forces
    x64) and is supported (emulated) on TPU.  Performance-critical entry
    points accept ``dtype=jnp.float32`` to select the fast TPU path.
    """
    env = os.environ.get("SDFS_TPU_DTYPE")
    if env:
        return jnp.dtype(env)
    return jnp.dtype(jnp.float64)


def on_tpu() -> bool:
    return jax.default_backend() not in ("cpu", "gpu")


def num_devices() -> int:
    return jax.device_count()
