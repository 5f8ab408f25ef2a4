"""Whole-Anderson-solve in one Pallas kernel.

The plain in-kernel successive-approximation solver (``solver_kernel``)
inherits the beta~1 contraction rate and the f32 rounding floor it
amplifies.  This kernel runs Type-II Anderson acceleration entirely
on-chip: iterate and history ring buffers live in VMEM scratch, the m x m
ridge normal equations are solved by an unrolled Gauss–Jordan on
registers, and the fixed-point map is the same two-matmul LSE form.
Converges in O(100-1000) iterations instead of O(10^4).  Note the f32
iteration noise floor (~2e-4 on the log iterate at 20^4 grids on TPU)
binds AA and SA alike: use the kernels for speed to the floor, and the
f64 XLA Newton path when more accuracy is needed.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.accurate import (_exp_f32_impl, _log1p_f32_impl,
                            _log_f32_impl)
from .fused_discrete import _VMEM_BUDGET_BYTES, kron_operands_ssy, \
    kron_operands_ssy_continuous

__all__ = ["make_fused_anderson_from_operands",
           "make_fused_anderson_ssy", "make_fused_anderson_ssy_continuous",
           "make_fused_anderson_gcy_continuous"]


def _aa_kernel(theta, beta_op, m, mix, beta_aa, ridge, has_sub, *refs):
    if has_sub:
        (ell_ref, tol_ref, maxit_ref, m1_ref, m2t_ref, kap_ref, sub_ref,
         out_ref, iters_ref, err_ref, X_ref, F_ref) = refs
        sub = sub_ref[:]
    else:
        (ell_ref, tol_ref, maxit_ref, m1_ref, m2t_ref, kap_ref,
         out_ref, iters_ref, err_ref, X_ref, F_ref) = refs
        sub = None
    tol = tol_ref[0]
    max_iter = maxit_ref[0]
    kap = kap_ref[:]
    M1 = m1_ref[:]
    M2T = m2t_ref[:]

    def T(ell):
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
        return _log1p_f32_impl(
            beta_op * _exp_f32_impl((sh2 + _log_f32_impl(u) + kap) / theta))

    # Mosaic-friendly small-matrix algebra: the m x (m+1) Gauss-Jordan
    # runs entirely through masked whole-array ops — no slicing (Mosaic:
    # "Not implemented: Offset change" on unaligned tiny slices), no 0-d
    # reductions (unsupported scalar squeeze), no scatter.
    rid = lax.broadcasted_iota(jnp.int32, (m, m + 1), 0)
    cid = lax.broadcasted_iota(jnp.int32, (m, m + 1), 1)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)

    def aa_step(fx):
        G = [F_ref[p_i] - X_ref[p_i] for p_i in range(m)]
        # Ridge normal equations: M = [A + ridge*scale*I | 1].
        M = jnp.where(cid == m, one, zero)
        tr = zero.reshape(1, 1)
        vals = {}
        for p_i in range(m):
            for q_i in range(p_i + 1):
                v = jnp.sum(G[p_i] * G[q_i], axis=(0, 1), keepdims=True)
                vals[(p_i, q_i)] = v
                if p_i == q_i:
                    tr = tr + v
        for (p_i, q_i), v in vals.items():
            mask = ((rid == p_i) & (cid == q_i)) | ((rid == q_i) & (cid == p_i))
            M = M + v * mask.astype(jnp.float32)
        ridge_term = jnp.float32(ridge) * jnp.maximum(
            tr / jnp.float32(m), jnp.float32(1e-30))
        M = M + ridge_term * ((rid == cid) & (cid < m)).astype(jnp.float32)
        # Masked Gauss-Jordan.
        for i in range(m):
            piv = jnp.sum(jnp.where((rid == i) & (cid == i), M, zero),
                          axis=(0, 1), keepdims=True)
            M = jnp.where(rid == i, M / piv, M)
            row_i = jnp.sum(jnp.where(rid == i, M, zero), axis=0,
                            keepdims=True)
            col_i = jnp.sum(jnp.where(cid == i, M, zero), axis=1,
                            keepdims=True)
            col_i = jnp.where(rid[:, :1] == i, zero, col_i)
            M = M - col_i * row_i
        sol = jnp.where(cid == m, M, zero)
        alpha_sum = jnp.sum(sol, axis=(0, 1), keepdims=True)       # (1, 1)
        w_x = jnp.float32(1.0 - beta_aa)
        w_f = jnp.float32(beta_aa)
        x_new = jnp.zeros_like(fx)
        for p_i in range(m):
            a_p = jnp.sum(jnp.where((rid == p_i) & (cid == m), M, zero),
                          axis=(0, 1), keepdims=True) / alpha_sum   # (1, 1)
            x_new = x_new + a_p * (w_x * X_ref[p_i] + w_f * F_ref[p_i])
        bad = jnp.max((~jnp.isfinite(x_new)).astype(jnp.float32),
                      axis=(0, 1), keepdims=True)
        return jnp.where(bad > 0.5, fx, x_new)

    def cond(state):
        _, err, it, _, _ = state
        return (err > tol) & (it < max_iter) & ~jnp.isnan(err)

    def body(state):
        ell, _, it, slot, mix_ctr = state
        fx = T(ell)
        err = jnp.max(jnp.abs(fx - ell))
        X_ref[pl.ds(slot, 1)] = ell[None]
        F_ref[pl.ds(slot, 1)] = fx[None]
        use_aa = (it >= jnp.int32(m)) & (mix_ctr == jnp.int32(0))
        # Branchless blend (the AA combination is cheap relative to T);
        # slot/mix counters carried explicitly — Mosaic's lowering of
        # weakly-typed modulo feeding a dynamic store recursed infinitely —
        # and the gate kept (1, 1)-shaped (0-d squeezes are unsupported).
        gate = jnp.where(use_aa, jnp.float32(1.0),
                         jnp.float32(0.0)).reshape(1, 1)
        ell_new = (gate * aa_step(fx) + (jnp.float32(1.0) - gate) * fx
                   ).astype(jnp.float32)
        one_i = jnp.int32(1)
        zero_i = jnp.int32(0)
        slot_new = jnp.where(slot + one_i >= jnp.int32(m), zero_i,
                             slot + one_i)
        mix_new = jnp.where(mix_ctr + one_i >= jnp.int32(mix), zero_i,
                            mix_ctr + one_i)
        return ell_new, err, it + one_i, slot_new, mix_new

    init = (ell_ref[:], jnp.float32(jnp.inf), jnp.int32(0), jnp.int32(0),
            jnp.int32(0))
    ell, err, it, _, _ = lax.while_loop(cond, body, init)
    out_ref[:] = ell
    iters_ref[0] = it
    err_ref[0] = err


def make_fused_anderson_from_operands(M1, M2T, log_kap, theta, beta, shapes,
                                      rows, cols, *,
                                      history: int = 5,
                                      mixing_frequency: int = 2,
                                      beta_aa: float = 1.0,
                                      ridge: float = 1e-6,
                                      sub=None,
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

    has_sub = sub is not None
    kernel = partial(_aa_kernel, theta, beta, history, mixing_frequency,
                     beta_aa, ridge, has_sub)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
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
        scratch_shapes=[
            pltpu.VMEM((history, rows, cols), jnp.float32),   # X history
            pltpu.VMEM((history, rows, cols), jnp.float32),   # F history
        ],
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


def make_fused_anderson_gcy_continuous(model, grids, degree: int = 5,
                                       baseline="loglinear",
                                       interpret: bool = False, **kw):
    """In-kernel Anderson solve for the *continuous* GCY factored operator
    (baseline-normalized by default; see solver_kernel twin)."""
    from .fused_discrete import kron_operands_gcy_continuous
    (M1, M2T, kap, shapes, rows, cols,
     sub) = kron_operands_gcy_continuous(model, grids, degree, baseline,
                                         jnp.float32)
    fsolve = make_fused_anderson_from_operands(
        M1, M2T, kap, model.theta, model.beta, shapes, rows, cols,
        sub=sub, interpret=interpret, **kw)
    if sub is not None:
        fsolve.baseline_log_w = (sub / model.theta).reshape(shapes)
    return fsolve


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
