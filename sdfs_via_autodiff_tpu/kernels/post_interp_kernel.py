"""Fused Pallas kernel for the post-power interpolation operators.

Replaces the XLA gather hot spot of the reference's ``interp="post"`` /
``"loglin"`` continuous semantics (reference ``code/ssy/continuous_junnan/
ssy_wc_ratio_continuous.py:90-153``: a 2^d-corner gather of w per
(state, node) pair).  Builds on the node-chain reformulation
(:mod:`..operators.post_interp`): interpolation at a fixed shock node is a
per-axis linear map of the field, so grouping the four state axes as rows
(h_lam, h_c) and columns (h_z, z) of a matrix view — the same grouping as
the two-phase kernels — turns each joint node's interpolant into exactly
TWO dense matmuls,

    V[(q1..q4)] = [B_lam[q1] (x) B_c[q2]]  F  [B_hz[q3] (*) B_z[q4]]^T,

with the row Kronecker product (n_l*n_k)^2 shared across all (q3, q4) and
the column product (n_i*n_j)^2 carrying the h_z-conditioning of sigma_z
(the (*) is the i-batched Kronecker).  The kernel walks a
(d^2 row-pairs, d^2 col-pairs) grid: the field and the running node
accumulator stay VMEM-resident for the whole operator application, the
row product G = W_r F is computed once per row pair, and each grid step
streams one column product from HBM, applies the pointwise
theta-power/payoff/weight in the exp domain under a precomputed global
shift, and accumulates — gathers become MXU matmuls and the field is read
from HBM exactly once.

Range requirement for the single shift (cf. ``mode="fast"`` of the tiled
kernels): theta * range(log w) + range(theta h_lam') + range(log weights)
must fit exp's float32 range (~85 log units) — true on standard SSY grids
(~35 total).  The accumulation is monotone (all terms positive, summed
under one shift), so no LSE passes are needed.

Scale envelope: the field, the accumulator and one operand pair live in
VMEM, capping the grid near ~24^4 points (~5 MB field) — which covers the
reference's post-interp use (15^4 default, 20^4 largest recorded,
``test_newton.md:219``); the million-point tier is the pre-interp tiled
path.  Monte Carlo nodes don't share per-axis factors, so MC stays on the
XLA node chain.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_post_interp_kernel_T_ssy"]


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _kernel(interp, theta, beta, field_ref, wr_ref, wc_ref, pay_ref, off_ref,
            s_ref, lkr_ref, lkc_ref, out_ref, G, acc):
    p, q = pl.program_id(0), pl.program_id(1)
    last = jnp.logical_and(p == pl.num_programs(0) - 1,
                           q == pl.num_programs(1) - 1)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(jnp.logical_and(p == 0, q == 0))
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(q == 0)
    def _():
        G[:] = jnp.dot(wr_ref[0], field_ref[:],
                       preferred_element_type=jnp.float32, precision=hi)

    # V[r, c] = sum_C G[r, C] Wc[c, C].  Accurate transcendentals: the
    # hardware f32 log's ~1e-4 error would otherwise dominate (see
    # ops/accurate.py), amplified by |theta| here.
    from ..ops.accurate import _exp_f32_impl, _log1p_f32_impl, _log_f32_impl
    V = jax.lax.dot_general(G[:], wc_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32, precision=hi)
    a = theta * (_log_f32_impl(V) if interp == "post" else V)
    acc[:] = acc[:] + _exp_f32_impl(a + pay_ref[0] + off_ref[p, q])

    @pl.when(last)
    def _():
        log_kg = (_log_f32_impl(acc[:]) + s_ref[0, 0] + lkr_ref[:]
                  + lkc_ref[:])
        out_ref[:] = _log1p_f32_impl(beta * _exp_f32_impl(log_kg / theta))


def make_post_interp_kernel_T_ssy(model, grids: Sequence,
                                  quad_degree: int = 5,
                                  interp: str = "post",
                                  interpret: bool = False) -> Callable:
    """Fused post/loglin-interpolation SSY operator (float32 tier).

    Maps ell = log w -> log T(w); differentiable via a custom JVP through
    the node-chain XLA twin (exposed as ``T.xla_twin``).
    """
    if interp not in ("post", "loglin"):
        raise ValueError(f"unknown interp {interp!r}")
    from ..operators.post_interp import (_log_kappa_parts_ssy,
                                         make_node_chain_T_ssy,
                                         node_basis_ssy, ssy_quadrature_nodes)
    from ..ops.quadrature import gauss_hermite_normal

    m = model
    theta, beta = float(m.theta), float(m.beta)
    n_l, n_k, n_i, n_j = (len(g) for g in grids)
    R, C = n_l * n_k, n_i * n_j
    d = quad_degree
    P12, P34 = d * d, d * d

    # Same actionable guard as the sibling fused kernels: the field,
    # per-node-pair (R, R)/(C, C) bases and two (R, C) scratch rows all
    # live in VMEM; past the budget Mosaic fails with an opaque
    # allocation error instead of this message.
    from .fused_discrete import _VMEM_BUDGET_BYTES
    # One (R, R) and one (C, C) node-pair block resident per grid step
    # (x2 for Mosaic's double buffering) plus the field and two (R, C)
    # scratch rows; ~9 MiB at the documented 24^4 envelope.
    working = 4 * (3 * R * C + 2 * (R * R + C * C))
    if working > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"state space {(n_l, n_k, n_i, n_j)} with degree {d} needs "
            f"~{working / 2**20:.1f} MiB VMEM; use the XLA node-chain "
            "engine (engine='node_chain') for grids this large")

    # Per-axis 1-D bases at the 1-D Gauss-Hermite nodes (host float64).
    eta1, w1 = gauss_hermite_normal(d)
    basis = node_basis_ssy(
        m, grids, np.broadcast_to(eta1, (4, d)).copy())
    B_lam, B_c, B_hz, B_z = (basis["B_lam"], basis["B_c"], basis["B_hz"],
                             basis["B_z"])
    pay1 = basis["pay"]                                     # (d, n_l)
    logw1 = np.log(w1)

    # Kronecker stacks: rows over (q1, q2), columns over (q3, q4) with the
    # z factor's h_z-conditioning folded into the column product.
    Wr = np.einsum("alL,bkK->ablkLK", B_lam, B_c).reshape(P12, R, R)
    Wc = np.einsum("aiI,bijJ->abijIJ", B_hz, B_z).reshape(P34, C, C)
    pay_row = np.broadcast_to(pay1[:, None, :, None],
                              (d, d, n_l, n_k)).reshape(P12, R)
    logw12 = np.add.outer(logw1, logw1).reshape(P12)
    logw34 = np.add.outer(logw1, logw1).reshape(P34)
    off_base = np.add.outer(logw12, logw34)                 # (P12, P34)
    log_A2, log_A3 = _log_kappa_parts_ssy(m, grids)
    lk_row = np.broadcast_to(log_A2[None, :, None],
                             (n_l, n_k, 1)).reshape(R, 1)
    lk_col = np.broadcast_to(log_A3[None, None, :],
                             (1, n_i, n_j)).reshape(1, C)
    smax = float(pay_row.max() + off_base.max())

    f32 = jnp.float32
    Wr_d = jnp.asarray(Wr, f32)
    Wc_d = jnp.asarray(Wc, f32)
    pay_d = jnp.asarray(pay_row.reshape(P12, R, 1), f32)
    off_d = jnp.asarray(off_base, f32)
    lkr_d = jnp.asarray(lk_row, f32)
    lkc_d = jnp.asarray(lk_col, f32)

    full = lambda shape: pl.BlockSpec(
        shape, lambda p, q, _n=len(shape): tuple(_i32(0) for _ in range(_n)),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, interp, theta, beta),
        grid=(P12, P34),
        out_shape=jax.ShapeDtypeStruct((R, C), f32),
        in_specs=[
            full((R, C)),                                          # field
            pl.BlockSpec((1, R, R), lambda p, q: (_i32(p), _i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),                 # Wr
            pl.BlockSpec((1, C, C), lambda p, q: (_i32(q), _i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),                 # Wc
            pl.BlockSpec((1, R, 1), lambda p, q: (_i32(p), _i32(0), _i32(0)),
                         memory_space=pltpu.VMEM),                 # pay
            pl.BlockSpec((P12, P34), lambda p, q: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),                 # off
            pl.BlockSpec((1, 1), lambda p, q: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),                 # s
            full((R, 1)), full((1, C)),                            # log kappa
        ],
        out_specs=full((R, C)),
        scratch_shapes=[pltpu.VMEM((R, C), f32), pltpu.VMEM((R, C), f32)],
        interpret=interpret,
    )

    nodes, logw = ssy_quadrature_nodes(d)
    xla_twin = make_node_chain_T_ssy(m, grids, nodes, logw, interp=interp,
                                     dtype=f32)

    def _primal(ell):
        ell = ell.astype(f32)
        # Single global shift: a <= theta*min(ell) + max payoff/weights
        # (theta < 0 and interp is a convex combination of ell values).
        s = theta * jnp.min(ell) + smax
        if interp == "post":
            from ..ops.accurate import accurate_exp
            c = jnp.max(ell)
            field = accurate_exp(ell - c)
            off = off_d + (theta * c - s)
        else:
            field = ell
            off = off_d - s
        out = call(field.reshape(R, C), Wr_d, Wc_d, pay_d, off,
                   s.reshape(1, 1), lkr_d, lkc_d)
        return out.reshape(ell.shape)

    @jax.custom_jvp
    def T(ell):
        return _primal(ell)

    @T.defjvp
    def _jvp(primals, tangents):
        (ell,), (dell,) = primals, tangents
        dout = jax.jvp(xla_twin, (ell,), (dell,))[1]
        return _primal(ell), dout

    T.xla_twin = xla_twin
    return T
