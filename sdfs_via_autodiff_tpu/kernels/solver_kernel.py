"""Whole-solve-in-one-kernel: successive approximation fused into Pallas.

At the SSY/GCY calibrations beta ~ 0.999, successive approximation needs
O(10^4) operator applications.  The XLA ``lax.while_loop`` solver pays
per-iteration HBM round-trips and loop overhead (~0.5 ms/iteration for a
10^4-point grid on v5e); with the state resident in VMEM, one iteration is
just two kron matmuls plus VPU elementwise — microseconds.  This kernel
runs the *entire solve* on-chip: HBM is touched once to read the initial
guess and once to write the fixed point.

Scope: any two-matmul-form operator (discrete SSY/GCY, continuous SSY)
in f32 (Mosaic has no f64), grids up to ~10^5 points (VMEM-bounded);
returns (ell*, iterations, residual) exactly like the XLA solver.  The
convergence check (sup-norm of the log-iterate update) and the NaN
divergence guard run in-kernel.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ssy import SSY
from ..ops.accurate import (_exp_f32_impl, _log1p_f32_impl,
                            _log_f32_impl)
from ..operators.discrete_ssy import SSYDiscretization
from .fused_discrete import (kron_operands_gcy, kron_operands_ssy,
                             kron_operands_ssy_continuous,
                             _VMEM_BUDGET_BYTES)

__all__ = ["make_fused_solver_ssy", "make_fused_solver_from_operands",
           "make_fused_solver_ssy_continuous", "make_fused_solver_gcy",
           "make_fused_solver_gcy_continuous"]


def _solver_kernel(theta, beta, has_sub, *refs):
    if has_sub:
        (ell_ref, tol_ref, maxit_ref, m1_ref, m2t_ref, kap_ref, sub_ref,
         out_ref, iters_ref, err_ref) = refs
        sub = sub_ref[:]
    else:
        (ell_ref, tol_ref, maxit_ref, m1_ref, m2t_ref, kap_ref,
         out_ref, iters_ref, err_ref) = refs
        sub = None
    tol = tol_ref[0]
    max_iter = maxit_ref[0]
    kap = kap_ref[:]
    M1 = m1_ref[:]
    M2T = m2t_ref[:]

    def T(ell):
        # Per-step LSE shifts, matching kernels/fused_discrete.py.
        p = theta * ell
        if sub is not None:
            p = p - sub
        sh1 = jnp.max(p, axis=0, keepdims=True)
        u = jnp.dot(M1, _exp_f32_impl(p - sh1),
                    preferred_element_type=jnp.float32)
        log_u = sh1 + _log_f32_impl(u)
        sh2 = jnp.max(log_u, axis=1, keepdims=True)
        u = jnp.dot(_exp_f32_impl(log_u - sh2), M2T,
                    preferred_element_type=jnp.float32)
        log_hwt = sh2 + _log_f32_impl(u) + kap
        return _log1p_f32_impl(beta * _exp_f32_impl(log_hwt / theta))

    def cond(state):
        _, err, it = state
        return (err > tol) & (it < max_iter) & ~jnp.isnan(err)

    def body(state):
        ell, _, it = state
        ell_new = T(ell)
        err = jnp.max(jnp.abs(ell_new - ell))
        return ell_new, err, it + 1

    init = (ell_ref[:], jnp.float32(jnp.inf), jnp.int32(0))
    ell, err, it = jax.lax.while_loop(cond, body, init)
    out_ref[:] = ell
    iters_ref[0] = it
    err_ref[0] = err


def make_fused_solver_from_operands(M1, M2T, log_kap, theta, beta, shapes,
                                    rows, cols, sub=None,
                                    interpret: bool = False) -> Callable:
    """Whole-solve kernel from prebuilt two-matmul operands (f32)."""
    working = (rows * cols * 5 + rows * rows + cols * cols) * 4
    if working > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"state space {shapes} needs ~{working/2**20:.1f} MiB VMEM; "
            "use the XLA solver for grids this large")

    has_sub = sub is not None
    kernel = partial(_solver_kernel, theta, beta, has_sub)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),      # ell0
        pl.BlockSpec(memory_space=pltpu.SMEM),      # tol (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),      # max_iter (1,)
        pl.BlockSpec(memory_space=pltpu.VMEM),      # M1
        pl.BlockSpec(memory_space=pltpu.VMEM),      # M2T
        pl.BlockSpec(memory_space=pltpu.VMEM),      # log_kappa
    ]
    if has_sub:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )

    @jax.jit
    def solve_fused(ell0, tol=1e-6, max_iter=100_000):
        ell_mat = ell0.reshape(rows, cols).astype(jnp.float32)
        args = (ell_mat,
                jnp.asarray([tol], jnp.float32),
                jnp.asarray([max_iter], jnp.int32),
                M1, M2T, log_kap) + ((sub,) if has_sub else ())
        ell, iters, err = call(*args)
        return ell.reshape(shapes), iters[0], err[0]

    return solve_fused


def make_fused_solver_ssy(model: SSY,
                          disc: SSYDiscretization,
                          interpret: bool = False) -> Callable:
    """Whole-solve kernel for the discrete SSY operator."""
    n_l, n_k, n_i, n_j = disc.shapes
    M1, M2T, log_kap = kron_operands_ssy(model, disc, jnp.float32)
    return make_fused_solver_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, disc.shapes,
        n_l * n_k, n_i * n_j, interpret=interpret)


def make_fused_solver_ssy_continuous(model: SSY, grids, degree: int = 5,
                                     interpret: bool = False) -> Callable:
    """Whole-solve kernel for the continuous SSY operator (quadrature,
    pre-power interpolation)."""
    shapes = tuple(len(g) for g in grids)
    n_l, n_k, n_i, n_j = shapes
    M1, M2T, log_kap = kron_operands_ssy_continuous(model, grids, degree,
                                                    jnp.float32)
    return make_fused_solver_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, shapes,
        n_l * n_k, n_i * n_j, interpret=interpret)


def make_fused_solver_gcy(model, disc, interpret: bool = False) -> Callable:
    """Whole-solve kernel for the discrete GCY operator."""
    n_a, n_b, n_c, n_d, n_e, n_l = disc.shapes
    M1, M2T, log_kap = kron_operands_gcy(model, disc, jnp.float32)
    return make_fused_solver_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, disc.shapes,
        n_a * n_b * n_c, n_d * n_e * n_l, interpret=interpret)


def make_fused_solver_gcy_continuous(model, grids, degree: int = 5,
                                     baseline="loglinear",
                                     interpret: bool = False) -> Callable:
    """Whole-solve kernel for the *continuous* GCY factored operator
    (quadrature, pre-power interp).  Baseline normalization defaults on —
    without it theta*(log-w range) ~ 200 overflows f32 on these grids."""
    from .fused_discrete import kron_operands_gcy_continuous
    (M1, M2T, kap, shapes, rows, cols,
     sub) = kron_operands_gcy_continuous(model, grids, degree, baseline,
                                         jnp.float32)
    fsolve = make_fused_solver_from_operands(
        M1, M2T, kap, model.theta, model.beta, shapes, rows, cols,
        sub=sub, interpret=interpret)
    if sub is not None:
        fsolve.baseline_log_w = (sub / model.theta).reshape(shapes)
    return fsolve
