"""Tiled HBM-resident Pallas kernels for the two-phase log-space operators.

The VMEM-resident fused kernels (``fused_discrete.py``) cap out where the
whole field + kron operands fit in ~16 MB of VMEM (~10^5 points).  These
kernels lift that cap: the field streams through VMEM in strips while the
small per-axis operands stay resident, so one operator application costs
exactly four HBM passes of the field —

    pass 1 (column phase): read ell strip-by-strip over rows, LSE-contract
        the two column axes (next-h_z, next-z) in VMEM, write the midway
        field;
    pass 2 (row phase): read the midway field strip-by-strip over columns,
        LSE-contract the two row axes (next-h_lam, next-h_c), apply the
        separable epilogue, write log T(w).

against the ~10 read/write passes of the unfused XLA einsum chain.  All
matmuls are skinny per-axis contractions (O(N * sum n_i) FLOPs) on the
MXU; exp/log/max run on the VPU over resident strips.  Operand math and
grouping live in :mod:`..operators.two_phase`; the plain-XLA twin there is
bit-identical math and provides the transposable tangent for the custom
JVP here (reverse-mode therefore also works).

Mosaic supports f32/bf16 (not the f64 double-float emulation), so this is
the float32 fast tier; combine with ``baseline="loglinear"`` operands on
wide grids and a float64 polish for full accuracy.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..operators.two_phase import TwoPhaseOperands, make_xla_two_phase_T
from ..ops.accurate import _exp_f32_impl, _log_f32_impl, _log1p_f32_impl


# Kernel-local transcendentals: hardware (fast, ~1e-4 abs error in log)
# or software-accurate (~1 ulp, see ops/accurate.py; a few extra VPU ops).
_TRX = {"fast": (jnp.exp, jnp.log, jnp.log1p),
        # hardware exp (~6e-6 relative) + faithfully-rounded log/log1p —
        # same tier the streamed kernels offer, so transcendentals=
        # "mixed" keeps working when dispatch falls back to strips.
        "mixed": (jnp.exp, _log_f32_impl, _log1p_f32_impl),
        "accurate": (_exp_f32_impl, _log_f32_impl, _log1p_f32_impl)}


def _i32(v):
    # Mosaic requires int32 index-map results; under the package's x64
    # config the program index and literal zeros trace as int64.
    return jnp.asarray(v, jnp.int32)

__all__ = ["make_tiled_T_log", "make_tiled_T_log_ssy",
           "make_tiled_T_log_ssy_continuous", "make_tiled_T_log_gcy",
           "make_tiled_T_log_gcy_continuous"]

# Per-buffer padded-footprint target; Pallas double-buffers input and
# output strips, so the working set is ~4x this plus operands.  Tuned on
# hardware at 11.2M points: 3.75 MB picks 32-row column strips (vs 16 at
# 3 MB) for a measured ~9% operator speedup; larger strips OOM Mosaic's
# 16 MB scoped-vmem (the batched contraction unrolls keep ~14x the strip
# footprint live).
_STRIP_BYTES = int(3.75 * 1024 * 1024)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_strip(n: int, unit_bytes: int, budget: int = _STRIP_BYTES,
                mult: int = 1) -> int:
    """Largest divisor of n whose strip footprint stays under budget,
    preferring multiples of ``mult`` (sublane alignment) when any exist."""
    cap = max(1, budget // max(unit_bytes, 1))
    best = best_aligned = 0
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap:
            best = d
            if d % mult == 0:
                best_aligned = d
    return best_aligned or best or 1


def _slice_W(W, b, exp_fn=_exp_f32_impl):
    """Slice b of a batched factor: dense (B, n, n) array, or the lazy
    (logW0, D (K, n, n), t (K, B)) triple with
    W[b] = exp(logW0 + sum_k t[k, b] * D[k]) — materialized on the fly so
    the (B, n, n) tensor never has to be VMEM-resident (the unlock for
    wide-z normalized grids — rank 1 for SSY, rank 2 for the normalized
    GCY fold whose z chain carries a z_pi mean shift on top of the
    sigma_z scale; see ``two_phase.TwoPhaseOperands`` lazy attributes).
    ``exp_fn`` follows the kernel's transcendentals setting."""
    if isinstance(W, tuple):
        log0, D, t = W
        a = log0
        for k in range(D.shape[0]):
            a = a + t[k, b] * D[k]
        return exp_fn(a)
    return W[b]


def _contract_c1(e, W, batched, prec, exp_fn=_exp_f32_impl):
    """Contract the c1 (middle) axis of e (TB, n1, n2) with W (n1, n1), or
    with W batched over the *next* c2 index — dense (n2, n1, n1) or lazy
    (see :func:`_slice_W`).

    The batched form unrolls into per-slice 2-D matmuls: Mosaic's 3-D
    ``tpu.matmul`` with batch dimensions miscompiles (layout check
    failure), so batched einsums must not reach it.
    """
    if not batched:
        return jnp.einsum("im,tmj->tij", W, e,
                          preferred_element_type=jnp.float32, precision=prec)
    n2 = e.shape[2]
    et = jnp.swapaxes(e, 1, 2)                       # (TB, n2, n1)
    rows = [_dot_p(et[:, j, :], _slice_W(W, j, exp_fn).T, prec)
            for j in range(n2)]                      # each (TB, n1)
    return jnp.swapaxes(jnp.stack(rows, axis=1), 1, 2)


def _contract_c2(e, W, batched, prec, out_ref=None, epilogue=None,
                 exp_fn=_exp_f32_impl):
    """Contract the c2 (last) axis of e (TB, n1, n2) with W (n2, n2), or
    with W (n1, n2, n2) batched over the *current* c1 index (unrolled —
    see :func:`_contract_c1`).

    When ``out_ref`` is given, the batched form streams each per-slice
    matmul (optionally through ``epilogue(u_slice, i)``) straight into
    ``out_ref[:, i, :]`` — no stacked intermediate, roughly halving the
    kernel's scoped-VMEM footprint.
    """
    if not batched:
        u = jnp.einsum("jm,tim->tij", W, e,
                       preferred_element_type=jnp.float32, precision=prec)
        if out_ref is None:
            return u
        out_ref[:] = epilogue(u, None) if epilogue else u
        return None
    n1 = e.shape[1]
    rows = []
    for i in range(n1):
        u = _dot_p(e[:, i, :], _slice_W(W, i, exp_fn).T, prec)   # (TB, n2)
        if out_ref is not None:
            out_ref[:, i, :] = epilogue(u, i) if epilogue else u
        else:
            rows.append(u)
    return None if out_ref is not None else jnp.stack(rows, axis=1)


_PRECISION = {"highest": jax.lax.Precision.HIGHEST,
              "default": jax.lax.Precision.DEFAULT}


def _dot_p(a, b, prec):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _take_w(refs, idx, lazy):
    """Pop a factor's refs: one dense ref, or the (logW0, D, t) triple."""
    if lazy:
        return (refs[idx][:], refs[idx + 1][:], refs[idx + 2][:]), idx + 3
    return refs[idx][:], idx + 1


def _col_phase_kernel(theta, c1_batched, c2_batched, has_sub, prec, trx,
                      lazy, *refs):
    _exp, _log, _ = _TRX[trx]
    lazy1, lazy2 = lazy
    ell_ref = refs[0]
    Wc1, idx = _take_w(refs, 1, lazy1)
    Wc2, idx = _take_w(refs, idx, lazy2)
    if has_sub:
        subr_ref, subc_ref = refs[idx], refs[idx + 1]
        idx += 2
    out_ref = refs[idx]
    a = theta * ell_ref[:]                     # (TB, n_c1, n_c2)
    if has_sub:
        a = a - subr_ref[:][:, :, None] - subc_ref[:][None, :, :]
    m = jnp.max(a, axis=1, keepdims=True)
    e = _exp(a - m)
    u = _contract_c1(e, Wc1, c1_batched, prec, exp_fn=_exp)
    a = m + _log(u)
    m = jnp.max(a, axis=2, keepdims=True)
    e = _exp(a - m)
    _contract_c2(e, Wc2, c2_batched, prec, out_ref=out_ref,
                 epilogue=lambda u, i: (m if i is None else m[:, i, :])
                 + _log(u), exp_fn=_exp)


def _row_phase_kernel(theta, beta, prec, trx, mid_ref, wr1_ref, wr2_ref,
                      addr_ref, addc_ref, out_ref):
    """Row phase (LSE).  The two row contractions unroll into per-slice
    2-D dots (Mosaic rejects leading-axis einsums at HIGHEST precision and
    miscompiles 3-D batched matmuls), streaming through a scoped scratch
    and straight into ``out_ref`` to keep the live set minimal."""
    _exp, _log, _log1p = _TRX[trx]
    n_r1, n_r2, _ = mid_ref.shape

    def body(scratch):
        a = mid_ref[:]                         # (n_r1, n_r2, TC)
        m = jnp.max(a, axis=0, keepdims=True)
        e = _exp(a - m)
        W1 = wr1_ref[:]
        for k in range(n_r2):
            scratch[:, k, :] = m[0, k, :][None, :] + _log(
                _dot_p(W1, e[:, k, :], prec))
        a2 = scratch[:]
        m2 = jnp.max(a2, axis=1, keepdims=True)
        e2 = _exp(a2 - m2)
        W2 = wr2_ref[:]
        addr = addr_ref[:]
        addc = addc_ref[:]
        for l in range(n_r1):
            lh = (m2[l] + _log(_dot_p(W2, e2[l], prec))
                  + addr[l][:, None] + addc)
            out_ref[l] = _log1p(beta * _exp(lh / theta))

    pl.run_scoped(body, pltpu.VMEM(mid_ref.shape, jnp.float32))


def _col_phase_fast_kernel(theta, c1_batched, c2_batched, has_sub, prec,
                           trx, lazy, *refs):
    """Column phase, single per-row shift (``mode="fast"``).

    One exp per element; the two column contractions run as plain matmul
    chains in the exp domain.  The per-row shift s[t] = max over the
    (c1, c2) block is emitted as a second output and folded back exactly
    in the row phase — same function as the LSE kernel, ~2.5x fewer
    transcendentals (the VPU bound at scale).  Requires the iterate's
    theta-range *within a row block* to fit exp's f32 range (~85 log
    units): guaranteed under baseline normalization, and true for the
    plain SSY operators on standard grids (theta * range(log w) ~ 13).
    """
    _exp, _log, _ = _TRX[trx]
    lazy1, lazy2 = lazy
    ell_ref = refs[0]
    Wc1, idx = _take_w(refs, 1, lazy1)
    Wc2, idx = _take_w(refs, idx, lazy2)
    if has_sub:
        subr_ref, subc_ref = refs[idx], refs[idx + 1]
        idx += 2
    u_ref, s_ref = refs[idx], refs[idx + 1]
    a = theta * ell_ref[:]                     # (TB, n_c1, n_c2)
    if has_sub:
        a = a - subr_ref[:][:, :, None] - subc_ref[:][None, :, :]
    # Single-axis reductions keep Mosaic's layout inference happy.
    s = jnp.max(jnp.max(a, axis=2, keepdims=True), axis=1, keepdims=True)
    e = _exp(a - s)
    u = _contract_c1(e, Wc1, c1_batched, prec, exp_fn=_exp)
    _contract_c2(u, Wc2, c2_batched, prec, out_ref=u_ref, exp_fn=_exp)
    s_ref[:] = s[:, :, 0]                      # (TB, 1)


def _row_phase_fast_kernel(theta, beta, prec, trx, u_ref, s_ref, wr1_ref,
                           wr2_ref, addr_ref, addc_ref, out_ref):
    """Row phase for ``mode="fast"``: rescale by exp(s - max s), contract,
    single log in the epilogue."""
    _exp, _log, _log1p = _TRX[trx]
    n_r1, n_r2, _ = u_ref.shape
    s = s_ref[:]                               # (n_r1, n_r2)
    m2 = jnp.max(jnp.max(s, axis=1, keepdims=True), axis=0, keepdims=True)
    scale = _exp(s - m2)

    def body(scratch):
        e = u_ref[:] * scale[:, :, None]       # (n_r1, n_r2, TC)
        W1 = wr1_ref[:]
        for k in range(n_r2):
            scratch[:, k, :] = _dot_p(W1, e[:, k, :], prec)
        e2 = scratch[:]
        W2 = wr2_ref[:]
        addr = addr_ref[:]
        addc = addc_ref[:]
        m2s = m2[0, 0]
        for l in range(n_r1):
            lh = (m2s + _log(_dot_p(W2, e2[l], prec))
                  + addr[l][:, None] + addc)
            out_ref[l] = _log1p(beta * _exp(lh / theta))

    pl.run_scoped(body, pltpu.VMEM(u_ref.shape, jnp.float32))


def make_tiled_T_log(ops: TwoPhaseOperands, dtype=jnp.float32,
                     mode: str = "auto", precision: str = "auto",
                     transcendentals: str = "accurate",
                     strip_bytes: int = _STRIP_BYTES,
                     lazy_bytes: int = 6 * 1024 * 1024,
                     engine: str = "auto",
                     twin_precision: str = "highest",
                     interpret: bool = False) -> Callable:
    """Tiled two-pass Pallas operator from a two-phase operand set.

    ``engine``: "auto" dispatches to the streamed big-matmul kernels
    (``streamed_two_phase.py`` — measured ~3x the strip kernels'
    throughput at 10^7 points) whenever they cover the operand set *and*
    the requested mode/transcendentals combination, and falls back to
    the strip kernels here otherwise; "strip" / "streamed" force a tier.
    ``strip_bytes`` and ``lazy_bytes`` tune the strip tier only (the
    streamed tier sizes its own blocks); pass ``engine="strip"`` when
    tuning them.

    Maps ell (4-D grid field) -> log T(w); differentiable via a custom JVP
    whose tangent runs through the XLA twin (transposable, so reverse-mode
    works; under ``jax.linearize`` the twin's primal intermediates are
    computed once per linearization point and shared by all matvecs).
    Exposes the twin as ``T.xla_twin``.

    mode: "lse" interleaves a log-sum-exp shift into every contraction
    (safe at any dynamic range); "fast" uses one shift per row block and
    plain matmul chains in the exp domain — fewer transcendental passes,
    exact whenever (a) the iterate's theta-range within a row block and
    (b) the running products of the factor matrices fit exp's f32 range.
    (a) holds on standard SSY grids (theta * range(log w) ~ 13); (b)
    *fails* for baseline-normalized operands, whose folded factors carry
    e^(theta*delta-phi) weights that the LSE steps renormalize away —
    "auto" therefore picks "fast" only for plain operands.
    """
    if dtype != jnp.float32:
        raise ValueError("tiled kernels are the float32 tier; use the XLA "
                         "operators for float64")
    if engine not in ("auto", "strip", "streamed"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine != "strip":
        from .streamed_two_phase import (make_streamed_T_log,
                                         streamed_coverable)
        cov = streamed_coverable(ops)
        if cov is not None:
            # Each tier resolves "auto" to its own documented default:
            # streamed -> "3x" (three bf16 passes, ~HIGHEST accuracy at
            # half the cost), strips below -> "highest" (no 3x there).
            try:
                return make_streamed_T_log(ops, dtype=dtype, mode=mode,
                                           precision=("3x" if precision ==
                                                      "auto" else precision),
                                           transcendentals=transcendentals,
                                           twin_precision=twin_precision,
                                           interpret=interpret,
                                           covered=cov)
            except ValueError:
                # Coverable operand set but a streamed-incompatible
                # option combination (e.g. mode="fast" on a deferred-c2
                # set, which runs per-axis LSE only): under "auto" the
                # strip kernels below still honour the request; a forced
                # engine="streamed" propagates the real error.  A
                # dense=False placeholder set (the make_tiled_T_log_gcy
                # streamed probe) cannot run the strip tier at all —
                # falling through would replace this error with the
                # strip builder's misleading "rebuild with dense=True".
                if engine == "streamed" or getattr(
                        ops, "dense_placeholder", False):
                    raise
        elif engine == "streamed" and getattr(ops, "pair_c2", None) is None:
            raise ValueError("operand set not covered by the streamed "
                             "kernels (batched c1 factor or oversized "
                             "column group)")
    if getattr(ops, "pair_c2", None) is not None:
        # Pair-factored sets (continuous GCY) have no dense c2 factor to
        # strip-tile; their only fast tier is the streamed pair
        # configuration, which just declined this shape.
        raise ValueError(
            "pair-factored operand sets (continuous GCY) run only on "
            "the streamed kernels' pair configuration, which needs "
            "n_z % 128 == 0, n_hlam % 8 == 0, (n_hz*n_hzpi) % 8 == 0 "
            f"and VMEM-sized blocks; shapes {ops.shapes} (pair "
            f"{ops.pair_shapes}) do not qualify — use the XLA factored "
            "chain (kernel='xla') at this grid")
    if mode == "auto":
        mode = "lse" if ops.has_sub else "fast"
    if mode not in ("lse", "fast"):
        raise ValueError(f"unknown mode {mode!r}")
    if transcendentals not in _TRX:
        raise ValueError(f"unknown transcendentals {transcendentals!r}")
    trx = transcendentals
    # precision="highest" keeps f32 operands in true f32 on the MXU (~6x
    # better one-application accuracy, measured 1.1e-4 vs 8e-4 sup);
    # "default" lets the MXU demote to one-pass bf16 (~2x faster kernel).
    if precision == "auto":
        precision = "highest"
    if precision not in _PRECISION:
        raise ValueError(
            f"unknown precision {precision!r} for the strip kernels "
            "(choose 'highest' or 'default'; '3x' exists only on the "
            "streamed tier)")
    prec = _PRECISION[precision]
    n_r1, n_r2, n_c1, n_c2 = ops.shapes
    R, C = n_r1 * n_r2, n_c1 * n_c2
    itemsize = np.dtype(np.float32).itemsize

    # Strip sizes: divisors of R / C with padded VMEM footprints in
    # budget.  ``strip_bytes`` tunes the target per-buffer footprint:
    # bigger strips amortize per-grid-step overhead (fewer steps) at the
    # cost of scoped VMEM; the default is conservative against Mosaic's
    # 16 MB scoped-vmem limit with batched (normalized) operands, and
    # ~2-4x larger values measurably help plain operators at 10^7-point
    # sizes.
    # The column phase keeps several tile-sized values live (exp/log
    # temporaries, per-slice unrolled matmuls, HIGHEST-precision matmul
    # scratch) and the whole working set must fit Mosaic's 16 MB
    # scoped-vmem limit, so it gets half the nominal strip budget.
    row_unit = _round_up(n_c1, 8) * _round_up(n_c2, 128) * itemsize
    # TB must be a multiple of 8 (or all of R) for the (TB, 1) shift
    # output block in fast mode — Mosaic's sublane-divisibility rule.
    # Budget: the col kernel keeps ~6-8 tile-sized values live (exp/log
    # temporaries, HIGHEST-precision matmul scratch, double-buffered I/O)
    # against Mosaic's 16 MB scoped-vmem limit.
    TB = _pick_strip(R, row_unit, strip_bytes // 4, mult=8)
    # Mosaic requires the row-phase block's last dim be 128-divisible or
    # equal to C: lane-blocked strips when C % 128 == 0, else one whole-C
    # strip (viable only while it fits VMEM — prefer grids whose column
    # group n_c1*n_c2 is a multiple of 128 at scale).
    lane_block = n_r1 * _round_up(n_r2, 8) * 128 * itemsize  # per 128 lanes
    if C % 128 == 0:
        # The row phase keeps ~5 block-sized values live (mid strip,
        # exp/log temporaries, scratch, double-buffered I/O), so its
        # budget stays at the conservative default — ``strip_bytes``
        # scales only the column-phase strips, where the win lives
        # (amortizing per-grid-step overhead over R/TB steps).
        TC = 128 * _pick_strip(C // 128, lane_block,
                               min(strip_bytes, _STRIP_BYTES) // 2)
    else:
        TC = C
    if (TB * row_unit > strip_bytes * 2
            or _round_up(TC, 128) // 128 * lane_block > strip_bytes * 2):
        raise ValueError(
            f"state space {ops.shapes} has no strip decomposition inside "
            f"the VMEM budget (column group C={C} must be 128-divisible "
            "to be lane-blocked); use the XLA two-phase operator")
    if mode == "fast" and TB % 8 != 0 and TB != R:
        # The fast path's (TB, 1) shift output needs sublane-aligned TB.
        mode = "lse"

    cast = lambda a: jnp.asarray(a, dtype)
    W_r1, W_r2, W_c1, W_c2 = map(cast, (ops.W_r1, ops.W_r2, ops.W_c1,
                                        ops.W_c2))
    add_row = cast(ops.add_row)
    add_col = cast(ops.add_col.reshape(1, C))
    theta_f = float(ops.theta)
    beta_f = float(ops.beta)

    # Batched column factors above this footprint switch to the lazy
    # (logW0, D, t) form when the operand set provides one — slices are
    # materialized in-kernel (W[b] = exp(logW0 + t[b] * D)) instead of
    # holding the (B, n, n) tensor in VMEM.  Costs one exp per factor
    # element per row strip; unlocks wide-z normalized grids.
    lazy1 = bool(ops.c1_batched and getattr(ops, "lazy_c1", None) is not None
                 and W_c1.size * itemsize > lazy_bytes)
    lazy2 = bool(ops.c2_batched and getattr(ops, "lazy_c2", None) is not None
                 and W_c2.size * itemsize > lazy_bytes)

    def lazy_operands(triple):
        log0, D, t = triple                  # D (K, n, n), t (K, B)
        return (cast(log0), cast(D), cast(t))

    has_sub = ops.has_sub
    if has_sub:
        sub_row = cast(ops.sub_row.reshape(R, 1))
        sub_col = cast(ops.sub_col)

    def full(a):
        # Whole-array operand (array or bare shape tuple), resident
        # across grid steps.  The explicit index map keeps Mosaic's
        # index types int32 (see _i32).
        shape = a if isinstance(a, tuple) else a.shape
        nd = len(shape)
        return pl.BlockSpec(shape,
                            lambda g, _n=nd: tuple(_i32(0) for _ in range(_n)),
                            memory_space=pltpu.VMEM)
    col_in_specs = [
        pl.BlockSpec((TB, n_c1, n_c2), lambda t: (_i32(t), _i32(0), _i32(0)),
                     memory_space=pltpu.VMEM),
    ]
    col_args = []
    for lz, W, trip in ((lazy1, W_c1, getattr(ops, "lazy_c1", None)),
                        (lazy2, W_c2, getattr(ops, "lazy_c2", None))):
        if lz:
            ops_l = lazy_operands(trip)
            col_in_specs += [full(a) for a in ops_l]
            col_args += list(ops_l)
        else:
            col_in_specs.append(full(W))
            col_args.append(W)
    if has_sub:
        col_in_specs += [
            pl.BlockSpec((TB, 1), lambda t: (_i32(t), _i32(0)),
                         memory_space=pltpu.VMEM),
            full(sub_col),
        ]
        col_args += [sub_row, sub_col]

    col_strip = pl.BlockSpec((TB, n_c1, n_c2),
                             lambda t: (_i32(t), _i32(0), _i32(0)),
                             memory_space=pltpu.VMEM)
    row_strip = pl.BlockSpec((n_r1, n_r2, TC),
                             lambda c: (_i32(0), _i32(0), _i32(c)),
                             memory_space=pltpu.VMEM)
    addc_strip = pl.BlockSpec((1, TC), lambda c: (_i32(0), _i32(c)),
                              memory_space=pltpu.VMEM)

    if mode == "lse":
        col_call = pl.pallas_call(
            partial(_col_phase_kernel, theta_f, ops.c1_batched,
                    ops.c2_batched, has_sub, prec, trx, (lazy1, lazy2)),
            grid=(R // TB,),
            out_shape=jax.ShapeDtypeStruct((R, n_c1, n_c2), dtype),
            in_specs=col_in_specs,
            out_specs=col_strip,
            interpret=interpret,
        )
        row_call = pl.pallas_call(
            partial(_row_phase_kernel, theta_f, beta_f, prec, trx),
            grid=(C // TC,),
            out_shape=jax.ShapeDtypeStruct((n_r1, n_r2, C), dtype),
            in_specs=[row_strip, full(W_r1), full(W_r2), full(add_row),
                      addc_strip],
            out_specs=row_strip,
            interpret=interpret,
        )

        def _primal(ell):
            mid = col_call(ell.astype(dtype).reshape(R, n_c1, n_c2),
                           *col_args)
            out = row_call(mid.reshape(n_r1, n_r2, C), W_r1, W_r2, add_row,
                           add_col)
            return out.reshape(ops.shapes)
    else:
        col_call = pl.pallas_call(
            partial(_col_phase_fast_kernel, theta_f, ops.c1_batched,
                    ops.c2_batched, has_sub, prec, trx, (lazy1, lazy2)),
            grid=(R // TB,),
            out_shape=(jax.ShapeDtypeStruct((R, n_c1, n_c2), dtype),
                       jax.ShapeDtypeStruct((R, 1), dtype)),
            in_specs=col_in_specs,
            out_specs=(col_strip,
                       pl.BlockSpec((TB, 1), lambda t: (_i32(t), _i32(0)),
                                    memory_space=pltpu.VMEM)),
            interpret=interpret,
        )
        row_call = pl.pallas_call(
            partial(_row_phase_fast_kernel, theta_f, beta_f, prec, trx),
            grid=(C // TC,),
            out_shape=jax.ShapeDtypeStruct((n_r1, n_r2, C), dtype),
            in_specs=[row_strip, full((n_r1, n_r2)),
                      full(W_r1), full(W_r2), full(add_row), addc_strip],
            out_specs=row_strip,
            interpret=interpret,
        )

        def _primal(ell):
            u, s = col_call(ell.astype(dtype).reshape(R, n_c1, n_c2),
                            *col_args)
            out = row_call(u.reshape(n_r1, n_r2, C),
                           s.reshape(n_r1, n_r2), W_r1, W_r2, add_row,
                           add_col)
            return out.reshape(ops.shapes)

    xla_twin = make_xla_two_phase_T(ops, dtype, precision=twin_precision)

    @jax.custom_jvp
    def T(ell):
        return _primal(ell)

    @T.defjvp
    def _jvp(primals, tangents):
        (ell,), (dell,) = primals, tangents
        # Tangent through the XLA twin: identical math, transposable, and
        # its primal intermediates become linearization residuals.  (The
        # twin casts internally; primal/tangent dtypes must match here.)
        dout = jax.jvp(xla_twin, (ell,), (dell,))[1]
        return _primal(ell), dout

    T.xla_twin = xla_twin
    T.strip_sizes = (TB, TC)
    T.mode = mode
    T.engine = "strip"
    T.precision = precision
    T.transcendentals = transcendentals
    if ops.baseline_log_w is not None:
        T.baseline_log_w = cast(ops.baseline_log_w)
    return T


def make_tiled_T_log_ssy(model, disc, baseline=None, dtype=jnp.float32,
                         mode: str = "auto", precision: str = "auto",
                         transcendentals: str = "accurate",
                         strip_bytes: int = _STRIP_BYTES,
                         lazy_bytes: int = 6 * 1024 * 1024,
                         engine: str = "auto",
                         twin_precision: str = "highest",
                         interpret: bool = False) -> Callable:
    """Tiled two-pass log-space T for the *discrete* SSY operator
    (reference ``ssy_wc_ratio.py:82-151``); ``baseline="loglinear"`` folds
    the normalized factors (required beyond ~40-point axes in f32)."""
    from ..operators.two_phase import two_phase_operands_ssy
    return make_tiled_T_log(two_phase_operands_ssy(model, disc, baseline),
                            dtype=dtype, mode=mode, precision=precision,
                            transcendentals=transcendentals,
                            strip_bytes=strip_bytes, lazy_bytes=lazy_bytes,
                            engine=engine,
                            twin_precision=twin_precision,
                            interpret=interpret)


def make_tiled_T_log_ssy_continuous(model, grids, degree: int = 5,
                                    baseline=None, dtype=jnp.float32,
                                    mode: str = "auto",
                                    precision: str = "auto",
                                    transcendentals: str = "accurate",
                                    strip_bytes: int = _STRIP_BYTES,
                                    engine: str = "auto",
                                    twin_precision: str = "highest",
                                    interpret: bool = False) -> Callable:
    """Tiled two-pass log-space T for the *continuous* factored-quadrature
    SSY operator (reference ``ssy_wc_ratio_continuous.py:125-153``,
    interp="pre")."""
    from ..operators.two_phase import two_phase_operands_ssy_continuous
    return make_tiled_T_log(
        two_phase_operands_ssy_continuous(model, grids, degree, baseline),
        dtype=dtype, mode=mode, precision=precision,
        transcendentals=transcendentals, strip_bytes=strip_bytes,
        engine=engine, twin_precision=twin_precision, interpret=interpret)


def make_tiled_T_log_gcy_continuous(model, grids, degree: int = 5,
                                    baseline=None, dtype=jnp.float32,
                                    mode: str = "auto",
                                    precision: str = "auto",
                                    transcendentals: str = "accurate",
                                    twin_precision: str = "highest",
                                    interpret: bool = False) -> Callable:
    """Streamed-pair log-space T for the *continuous* factored-quadrature
    six-state GCY operator (reference
    ``gcy_wc_ratio_continuous.py:158-187``, interp="pre").

    The conditioned z / z_pi expectation matrices (P_z on current h_z
    AND z_pi; P_zpi on current h_zpi) do not conjugate into shared
    factors, so this family runs the streamed kernels' *pair*
    configuration (``streamed_two_phase.build_c_call_pair``): the
    (h_z (x) h_zpi) Kron factor contracts in the deferred pass B and
    the conditioned pair contracts per-slice in pass C — exact
    per-axis-chain FLOPs with two HBM passes of the field.  Grid
    constraints: n_z % 128 == 0, n_hlam % 8 == 0, (n_hz*n_hzpi) % 8
    == 0 (use kernel='xla' otherwise).  ``baseline="loglinear"`` (or an
    ``additive_profiles`` pair) is effectively required: GCY's
    theta = -36 puts the plain iterate far outside f32's exp range.

    The returned T maps the natural 6-D field ``ell[h_lam, h_c, h_z,
    h_zpi, z, z_pi]`` -> log T(w); ``T.view_T`` / ``T.to_view`` /
    ``T.from_view`` expose the transpose-free view operator, as in
    :func:`make_tiled_T_log_gcy`.
    """
    from ..operators.two_phase import two_phase_operands_gcy_continuous
    if baseline is None:
        from ..models.gcy import gcy_loglinear_factory
        from ..operators.continuous_common import warn_if_f32_range_unsafe
        warn_if_f32_range_unsafe(model, grids, gcy_loglinear_factory,
                                 dtype)
    ops = two_phase_operands_gcy_continuous(model, grids, degree,
                                            baseline)
    view_T = make_tiled_T_log(ops, dtype=dtype, mode=mode,
                              precision=precision,
                              transcendentals=transcendentals,
                              engine="streamed",
                              twin_precision=twin_precision,
                              interpret=interpret)
    perm, inv_perm = ops.perm, ops.inv_perm
    state_shapes = ops.state_shapes
    view_shapes = tuple(state_shapes[p] for p in perm)

    def to_view(ell):
        return jnp.transpose(ell, perm)

    def from_view(ell_v):
        return jnp.transpose(ell_v, inv_perm)

    def T(ell):
        return from_view(view_T(to_view(ell).reshape(ops.shapes))
                         .reshape(view_shapes))

    T.view_T = view_T
    T.to_view = to_view
    T.from_view = from_view
    T.xla_twin = lambda ell: from_view(
        view_T.xla_twin(to_view(ell).reshape(ops.shapes))
        .reshape(view_shapes))
    T.strip_sizes = view_T.strip_sizes
    T.mode = view_T.mode
    T.engine = getattr(view_T, "engine", None)
    T.precision = getattr(view_T, "precision", None)
    T.transcendentals = getattr(view_T, "transcendentals", None)
    if getattr(view_T, "baseline_log_w", None) is not None:
        T.baseline_log_w = from_view(
            jnp.asarray(view_T.baseline_log_w).reshape(view_shapes))
    return T


def make_tiled_T_log_gcy(model, disc, dtype=jnp.float32,
                         mode: str = "auto", precision: str = "auto",
                         transcendentals: str = "accurate",
                         engine: str = "auto",
                         baseline: "Optional[str]" = None,
                         lazy_bytes: int = 6 * 1024 * 1024,
                         twin_precision: str = "highest",
                         interpret: bool = False) -> Callable:
    """Tiled two-pass log-space T for the *discrete six-state GCY*
    operator (reference ``gcy_wc_ratio.py:134-238``) via Kronecker
    grouping (see ``two_phase.two_phase_operands_gcy``): rows
    (z (x) z_pi, h_z (x) h_zpi), columns (h_c, h_lam).

    The returned T maps the natural 6-D field ``ell[z, z_pi, h_z, h_c,
    h_zpi, h_lam]`` -> log T(w); internally it iterates on the permuted
    (a, b, c, e, d, l) view (one XLA transpose in, one out — fused into
    the neighbouring elementwise work).  ``T.view_T`` exposes the
    transpose-free operator on the view layout together with
    ``T.to_view`` / ``T.from_view`` for solvers that iterate at scale.

    GCY's theta = -36 gives the plain operator a wide dynamic range, so
    "auto" mode resolves to the per-axis-LSE kernel (range-safe at any
    grid span).  ``baseline="loglinear"`` runs the *normalized* operand
    set (``two_phase_operands_gcy(baseline="loglinear")``): the
    log-linear baseline conjugates into the factors — shared row
    factors plus rank-2 lazy batched column factors — which keeps the
    f32 kernels in range on wide-Rouwenhorst grids whose plain operands
    warn/NaN, and exposes ``T.baseline_log_w`` as the warm start.

    engine="auto" (the ``make_tiled_T_log`` dispatch) routes 128-aligned
    column groups to the streamed kernels' *deferred-c2* configuration
    (``streamed_two_phase.py``): pass B contracts the (z (x) z_pi) Kron
    factor on (TB, I, TJ) blocks and the (h_z (x) h_zpi) map moves into
    pass C.  At the 25.2M-point north-star grid both engines land within
    a few percent at the accurate tier (3.79 vs 3.93 ms/app,
    BENCH_SUITE — the linear-carry row phase lifted the strip kernels
    too); the deferred engine's margin grows with the cheaper
    transcendental tiers (``transcendentals="mixed"`` measured
    2.6 ms/app) and it is the configuration the sharded streamed tier
    runs.  Grids whose (n_hz*n_hzpi) group is not a multiple of 128 stay
    on the strip kernels.
    """
    from ..operators.two_phase import two_phase_operands_gcy
    if baseline is not None and engine != "strip":
        # Probe with dense=False: when the conjugated-shared streamed
        # tier covers the set (it uses only the lazy triples), the
        # dense (B, n, n) batched factors are never touched — skipping
        # them saves O(minutes) of host time at 10^7-point grids and
        # avoids building arrays that overflow f32 at wide-Rouwenhorst
        # spans.  The strip tier (dense or lazy-batched + dense twin)
        # rebuilds with dense=True below.
        from .streamed_two_phase import streamed_coverable
        ops = two_phase_operands_gcy(model, disc, baseline=baseline,
                                     dense=False)
        if streamed_coverable(ops) is None:
            ops = two_phase_operands_gcy(model, disc, baseline=baseline)
    else:
        ops = two_phase_operands_gcy(model, disc, baseline=baseline)
    if mode == "auto":
        mode = "lse"
    view_T = make_tiled_T_log(ops, dtype=dtype, mode=mode,
                              precision=precision,
                              transcendentals=transcendentals,
                              engine=engine, lazy_bytes=lazy_bytes,
                              twin_precision=twin_precision,
                              interpret=interpret)
    perm, inv_perm = ops.perm, ops.inv_perm
    state_shapes = ops.state_shapes
    view_shapes = tuple(state_shapes[p] for p in perm)

    def to_view(ell):
        return jnp.transpose(ell, perm)

    def from_view(ell_v):
        return jnp.transpose(ell_v, inv_perm)

    def T(ell):
        return from_view(view_T(to_view(ell).reshape(ops.shapes))
                         .reshape(view_shapes))

    T.view_T = view_T
    T.to_view = to_view
    T.from_view = from_view
    T.xla_twin = lambda ell: from_view(
        view_T.xla_twin(to_view(ell).reshape(ops.shapes))
        .reshape(view_shapes))
    T.strip_sizes = view_T.strip_sizes
    T.mode = view_T.mode
    T.engine = getattr(view_T, "engine", None)
    T.precision = getattr(view_T, "precision", None)
    T.transcendentals = getattr(view_T, "transcendentals", None)
    if getattr(view_T, "baseline_log_w", None) is not None:
        T.baseline_log_w = from_view(
            jnp.asarray(view_T.baseline_log_w).reshape(view_shapes))
    return T
