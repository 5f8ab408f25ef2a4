"""Log-sum-exp factored contractions.

``log(M @ exp(a))`` computed with a shift along the contracted axis:

    m = max(a, axis); result = m + log(M @ exp(a - m))

Each step stays a dense matmul on the MXU with all exponentials in (0, 1].
A *single global* shift (as in a naive log-space formulation) overflows
f32 once the iterate's dynamic range exceeds exp's range — at the SSY
calibration theta*Delta(log w) passes the f32 limit (~87) already on
~50^4 Rouwenhorst grids, whose ladders span ±7 standard deviations.  The
per-axis shifts here are exact (no clamping) and cost one max/exp/log per
contraction step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["lse_matmul", "einsum_p"]


def einsum_p(subscripts: str, M, E, precision: str = "highest"):
    """Two-operand einsum with a named precision tier.

    "highest": true-f32 MXU passes (6 bf16 passes on TPU — the accuracy
    default).  "3x": three native-bf16 passes on hi/lo operand splits
    (the streamed kernels' scheme, ``kernels/streamed_two_phase._dot_p``
    — ~2^-17 relative on positive summands at half HIGHEST's cost; the
    inexact-Newton inner matvecs with inner_tol=1e-4 are its intended
    consumer).  "default": one bf16 pass (~1e-3, throughput
    experiments).  float64 operands always use HIGHEST (the bf16 split
    would destroy f64 precision)."""
    if precision not in ("highest", "3x", "default"):
        raise ValueError(f"unknown precision {precision!r} "
                         "(choose 'highest', '3x', or 'default')")
    if precision == "3x" and jnp.result_type(M, E) == jnp.float32:
        Mh = M.astype(jnp.bfloat16)
        Ml = (M - Mh.astype(jnp.float32)).astype(jnp.bfloat16)
        Eh = E.astype(jnp.bfloat16)
        El = (E - Eh.astype(jnp.float32)).astype(jnp.bfloat16)
        ein = lambda a, b: jnp.einsum(subscripts, a, b,
                                      preferred_element_type=jnp.float32)
        return ein(Mh, Eh) + ein(Mh, El) + ein(Ml, Eh)
    prec = (jax.lax.Precision.DEFAULT if precision == "default"
            else jax.lax.Precision.HIGHEST)
    return jnp.einsum(subscripts, M, E, precision=prec)


def lse_matmul(M: jnp.ndarray, log_v: jnp.ndarray, subscripts: str,
               axis: int, transcendentals: str = "accurate",
               precision: str = "highest") -> jnp.ndarray:
    """log of ``einsum(subscripts, M, exp(log_v))`` with a per-slice shift
    over the contracted ``axis`` of ``log_v``.

    ``subscripts`` must contract exactly the given axis of ``log_v`` and
    produce an output whose shape broadcasts against
    ``max(log_v, axis, keepdims=True)`` (true for all the per-axis
    contractions used by the operators, where the contracted axis is
    replaced by the matching current-state axis in place).

    All entries of ``M`` must be non-negative.

    ``transcendentals``: "accurate" (default) uses the faithfully-rounded
    software f32 exp/log (``ops/accurate.py``) — the TPU VPU's hardware
    f32 log is the dominant error source of the whole chain (~1e-4 abs).
    "fast" uses the hardware ops: in the *unfused* XLA chain the 10+
    separate software-polynomial VPU passes cost ~6x wall time (the
    tiled/fused kernels absorb them into DMA slack and keep accurate at
    no cost) — an escape hatch for speed-over-accuracy runs of the XLA
    tier.  "mixed" pairs the hardware exp (~6e-6 relative — not the
    dominant error) with the accurate log, matching the strip/streamed
    kernels' tier of the same name so ``engine="auto"`` fallbacks keep
    the option.  No-op for float64 either way.

    ``precision``: "highest" (default — true-f32 MXU passes), "3x"
    (three-pass bf16 hi/lo splits, ~2^-17 relative at half the matmul
    cost — the Newton inner-matvec tier), or "default" (one bf16 pass);
    see :func:`einsum_p`.
    """
    if transcendentals == "fast":
        exp_, log_ = jnp.exp, jnp.log
    elif transcendentals == "mixed":
        from .accurate import accurate_log as log_
        exp_ = jnp.exp
    elif transcendentals == "accurate":
        from .accurate import accurate_exp as exp_, accurate_log as log_
    else:
        raise ValueError(f"unknown transcendentals {transcendentals!r}")

    m = jnp.max(log_v, axis=axis, keepdims=True)
    # An all--inf contracted slice (log of exact-zero mass) must yield
    # -inf, not NaN: -inf - -inf = NaN inside exp.  Shifting by 0 there
    # gives exp(-inf) = 0 -> log(0) = -inf, the correct limit.
    m = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    # HIGHEST keeps f32 operands in true f32 on the MXU (the TPU default
    # demotes them to one-pass bf16, a measured ~6x loss on the operator's
    # one-application error); these contractions are bandwidth-bound, so
    # the extra multiplier passes are ~free.  No-op for float64.
    u = einsum_p(subscripts, M, exp_(log_v - m), precision)
    return m + log_(u)
