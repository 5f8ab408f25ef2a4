"""Operator-refactor comparison harness.

Port of the reference's ``compare_T_factories``
(``ssy_wc_ratio_continuous.py:330-453``, GCY twin :368-491): given two
operator builders, measure compile time, per-application wall time, and
result agreement — for the plain operator and for a hand-built Newton step
(JVP + BiCGStab) — so operator refactors can be validated for speed *and*
bit-level behaviour in one call.

Usage::

    from benchmarks.compare import compare_operators
    report = compare_operators(lambda: build_T_old(...),
                               lambda: build_T_new(...),
                               x0, n_runs=100)
    print(report)
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class CompareReport:
    compile_s_old: float
    compile_s_new: float
    per_call_s_old: float
    per_call_s_new: float
    max_abs_diff: float
    newton_compile_s_old: float
    newton_compile_s_new: float
    newton_per_call_s_old: float
    newton_per_call_s_new: float
    newton_max_abs_diff: float

    @property
    def speedup(self) -> float:
        return self.per_call_s_old / self.per_call_s_new

    @property
    def newton_speedup(self) -> float:
        return self.newton_per_call_s_old / self.newton_per_call_s_new

    def __str__(self):
        return (
            f"T:      compile {self.compile_s_old:.3f}s -> "
            f"{self.compile_s_new:.3f}s; per-call "
            f"{self.per_call_s_old * 1e3:.3f}ms -> "
            f"{self.per_call_s_new * 1e3:.3f}ms "
            f"({self.speedup:.2f}x); max|diff| {self.max_abs_diff:.3e}\n"
            f"Newton: compile {self.newton_compile_s_old:.3f}s -> "
            f"{self.newton_compile_s_new:.3f}s; per-call "
            f"{self.newton_per_call_s_old * 1e3:.3f}ms -> "
            f"{self.newton_per_call_s_new * 1e3:.3f}ms "
            f"({self.newton_speedup:.2f}x); "
            f"max|diff| {self.newton_max_abs_diff:.3e}")


def _newton_step(T: Callable) -> Callable:
    """One matrix-free Newton–Kantorovich step (the structure the reference
    inlines at ``ssy_wc_ratio_continuous.py:399-414``)."""
    g = lambda x: T(x) - x

    @jax.jit
    def q(x):
        jac = lambda v: jax.jvp(g, (x,), (v,))[1]
        gx = g(x)
        atol = 1e-4 * jnp.linalg.norm(gx.reshape(-1))
        b, _ = jax.scipy.sparse.linalg.bicgstab(jac, gx, atol=atol)
        return x - b

    return q


def _time_compile_and_calls(fn, xs, n_runs):
    t0 = time.perf_counter()
    out0 = jax.block_until_ready(fn(xs[0]))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(x) for x in xs[:n_runs]]
    jax.block_until_ready(outs)
    per_call = (time.perf_counter() - t0) / max(1, n_runs)
    return compile_s, per_call, out0, outs


def compare_operators(build_old: Callable[[], Callable],
                      build_new: Callable[[], Callable],
                      x0,
                      n_runs: int = 20,
                      newton_runs: int = 3,
                      seed: int = 1234,
                      perturbation: float = 0.05) -> CompareReport:
    """Compare two operator builders on timing and agreement.

    ``x0`` is a representative iterate; timed inputs are random
    perturbations ``x0 * exp(perturbation * N(0,1))`` (the reference uses
    random w fields, ``ssy_wc_ratio_continuous.py:372``).
    """
    T_old = jax.jit(build_old())
    T_new = jax.jit(build_new())

    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (max(n_runs, newton_runs),) + x0.shape,
                              dtype=x0.dtype)
    xs = [x0 * jnp.exp(perturbation * n) for n in noise]

    c_old, p_old, out_old, outs_old = _time_compile_and_calls(T_old, xs, n_runs)
    c_new, p_new, out_new, outs_new = _time_compile_and_calls(T_new, xs, n_runs)
    diff = max(float(jnp.max(jnp.abs(a - b)))
               for a, b in zip(outs_old, outs_new))

    q_old = _newton_step(T_old)
    q_new = _newton_step(T_new)
    nc_old, np_old, nout_old, nouts_old = _time_compile_and_calls(
        q_old, xs, newton_runs)
    nc_new, np_new, nout_new, nouts_new = _time_compile_and_calls(
        q_new, xs, newton_runs)
    ndiff = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(nouts_old, nouts_new))

    return CompareReport(
        compile_s_old=c_old, compile_s_new=c_new,
        per_call_s_old=p_old, per_call_s_new=p_new,
        max_abs_diff=diff,
        newton_compile_s_old=nc_old, newton_compile_s_new=nc_new,
        newton_per_call_s_old=np_old, newton_per_call_s_new=np_new,
        newton_max_abs_diff=ndiff)
