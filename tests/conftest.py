"""Test configuration: force a CPU backend with 8 virtual devices.

Correctness tests run on host CPU in true float64 (the TPU backend's f64 is
a float32-range double-float emulation, so exact-parity checks belong on
CPU), with an 8-device virtual mesh for the sharding tests — the standard
way to test ICI layouts without multi-chip hardware (see SURVEY.md §4).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
