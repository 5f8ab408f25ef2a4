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

__all__ = ["lse_matmul"]


def lse_matmul(M: jnp.ndarray, log_v: jnp.ndarray, subscripts: str,
               axis: int, transcendentals: str = "accurate") -> jnp.ndarray:
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
    # HIGHEST keeps f32 operands in true f32 on the MXU (the TPU default
    # demotes them to one-pass bf16, a measured ~6x loss on the operator's
    # one-application error); these contractions are bandwidth-bound, so
    # the extra multiplier passes are ~free.  No-op for float64.
    u = jnp.einsum(subscripts, M, exp_(log_v - m),
                   precision=jax.lax.Precision.HIGHEST)
    return m + log_(u)
