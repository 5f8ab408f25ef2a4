"""Benchmark-harness smoke test (port of compare_T_factories semantics)."""

import jax.numpy as jnp

from benchmarks.compare import compare_operators
from sdfs_via_autodiff_tpu import SSY, T_ssy_factory, discretize_ssy


def test_compare_identical_builders_agree():
    m = SSY()
    shapes = (4, 4, 4, 4)
    disc = discretize_ssy(m, shapes)
    build = lambda: T_ssy_factory(m, disc, space="log", jit=False)
    rep = compare_operators(build, build, jnp.full(shapes, jnp.log(800.0)),
                            n_runs=3, newton_runs=1)
    assert rep.max_abs_diff < 1e-12
    assert rep.per_call_s_old > 0 and rep.per_call_s_new > 0
    assert "x)" in str(rep)
