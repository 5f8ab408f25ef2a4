"""Whole-Anderson-solve in one Pallas kernel.

The plain in-kernel successive-approximation solver (``solver_kernel``)
inherits the beta~1 contraction rate and the f32 rounding floor it
amplifies.  This kernel runs Type-II Anderson acceleration entirely
on-chip: iterate and history ring buffers live in VMEM scratch, the m x m
ridge normal equations are solved by an unrolled Gauss–Jordan on
registers, and the fixed-point map is the same two-matmul LSE form.
Converges in O(100) iterations instead of O(10^4), which also sidesteps
most of the SA noise-floor accumulation.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_discrete import _VMEM_BUDGET_BYTES, kron_operands_ssy, \
    kron_operands_ssy_continuous

__all__ = ["make_fused_anderson_from_operands",
           "make_fused_anderson_ssy", "make_fused_anderson_ssy_continuous"]


def _aa_kernel(theta, beta_op, m, mix, beta_aa, ridge,
               ell_ref, tol_ref, maxit_ref, m1_ref, m2t_ref, kap_ref,
               out_ref, iters_ref, err_ref, X_ref, F_ref):
    tol = tol_ref[0]
    max_iter = maxit_ref[0]
    kap = kap_ref[:]
    M1 = m1_ref[:]
    M2T = m2t_ref[:]

    def T(ell):
        p = theta * ell
        sh1 = jnp.max(p, axis=0, keepdims=True)
        u = jnp.dot(M1, jnp.exp(p - sh1), preferred_element_type=jnp.float32)
        log_u = sh1 + jnp.log(u)
        sh2 = jnp.max(log_u, axis=1, keepdims=True)
        u = jnp.dot(jnp.exp(log_u - sh2), M2T,
                    preferred_element_type=jnp.float32)
        return jnp.log1p(beta_op * jnp.exp((sh2 + jnp.log(u) + kap) / theta))

    def aa_step(fx):
        # Ridge normal equations over the m stored (X, F) pairs; the m x m
        # system solves on registers via unrolled Gauss-Jordan.
        A = jnp.zeros((m, m), jnp.float32)
        for p_i in range(m):
            gp = F_ref[p_i] - X_ref[p_i]
            for q_i in range(p_i + 1):
                val = jnp.sum(gp * (F_ref[q_i] - X_ref[q_i]))
                A = A.at[p_i, q_i].set(val).at[q_i, p_i].set(val)
        A = A + ridge * jnp.maximum(jnp.trace(A) / m, 1e-30) * jnp.eye(m)
        M = jnp.concatenate([A, jnp.ones((m, 1), jnp.float32)], axis=1)
        for i in range(m):
            M = M / jnp.where(jnp.arange(m) == i, M[i, i], 1.0)[:, None]
            row = M[i]
            elim = jnp.where(jnp.arange(m)[:, None] == i, 0.0, M[:, i:i + 1])
            M = M - elim * row[None, :]
        alpha = M[:, m] / jnp.sum(M[:, m])
        x_new = jnp.zeros_like(fx)
        for p_i in range(m):
            x_new = x_new + alpha[p_i] * ((1.0 - beta_aa) * X_ref[p_i]
                                          + beta_aa * F_ref[p_i])
        ok = jnp.all(jnp.isfinite(x_new))
        return jnp.where(ok, x_new, fx)

    def cond(state):
        _, err, it = state
        return (err > tol) & (it < max_iter) & ~jnp.isnan(err)

    def body(state):
        ell, _, it = state
        fx = T(ell)
        err = jnp.max(jnp.abs(fx - ell))
        slot = it % m
        X_ref[pl.ds(slot, 1)] = ell[None]
        F_ref[pl.ds(slot, 1)] = fx[None]
        use_aa = (it >= m) & (it % mix == 0)
        ell_new = lax.cond(use_aa,
                           lambda: aa_step(fx).astype(jnp.float32),
                           lambda: fx.astype(jnp.float32))
        return ell_new, err, it + 1

    init = (ell_ref[:], jnp.float32(jnp.inf), jnp.int32(0))
    ell, err, it = lax.while_loop(cond, body, init)
    out_ref[:] = ell
    iters_ref[0] = it
    err_ref[0] = err


def make_fused_anderson_from_operands(M1, M2T, log_kap, theta, beta, shapes,
                                      rows, cols, *,
                                      history: int = 8,
                                      mixing_frequency: int = 1,
                                      beta_aa: float = 1.0,
                                      ridge: float = 1e-6,
                                      interpret: bool = False) -> Callable:
    """``solve(ell0, tol, max_iter) -> (ell*, iters, residual)`` with
    in-kernel Anderson acceleration (f32)."""
    working = (rows * cols * (4 + 2 * history)
               + rows * rows + cols * cols) * 4
    if working > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"state space {shapes} with history {history} needs "
            f"~{working/2**20:.1f} MiB VMEM; reduce history or use the XLA "
            "solver")

    kernel = partial(_aa_kernel, theta, beta, history, mixing_frequency,
                     beta_aa, ridge)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((history, rows, cols), jnp.float32),   # X history
            pltpu.VMEM((history, rows, cols), jnp.float32),   # F history
        ],
        interpret=interpret,
    )

    @jax.jit
    def solve_fused(ell0, tol=1e-6, max_iter=100_000):
        ell_mat = ell0.reshape(rows, cols).astype(jnp.float32)
        ell, iters, err = call(
            ell_mat,
            jnp.asarray([tol], jnp.float32),
            jnp.asarray([max_iter], jnp.int32),
            M1, M2T, log_kap)
        return ell.reshape(shapes), iters[0], err[0]

    return solve_fused


def make_fused_anderson_ssy(model, disc, interpret: bool = False, **kw):
    n_l, n_k, n_i, n_j = disc.shapes
    M1, M2T, log_kap = kron_operands_ssy(model, disc, jnp.float32)
    return make_fused_anderson_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, disc.shapes,
        n_l * n_k, n_i * n_j, interpret=interpret, **kw)


def make_fused_anderson_ssy_continuous(model, grids, degree: int = 5,
                                       interpret: bool = False, **kw):
    shapes = tuple(len(g) for g in grids)
    n_l, n_k, n_i, n_j = shapes
    M1, M2T, log_kap = kron_operands_ssy_continuous(model, grids, degree,
                                                    jnp.float32)
    return make_fused_anderson_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, shapes,
        n_l * n_k, n_i * n_j, interpret=interpret, **kw)
