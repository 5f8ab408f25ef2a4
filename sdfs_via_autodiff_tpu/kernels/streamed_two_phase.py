"""Streamed big-matmul Pallas kernels for the two-phase log-space operators.

Second-generation fast tier (successor of the strip kernels in
``tiled_two_phase.py`` for operand sets whose c1 factor is a shared
matrix).  Hardware attribution on v5e showed the round-2 kernels (and a
naive streamed rewrite) bound not by HBM but by (a) Mosaic's lowering of
middle-axis einsum contractions into slivers (0.57 ms/application for
the c1 contraction alone vs 0.14 ms for the leading-axis form) and (b)
6-pass HIGHEST-precision matmul emulation on small contraction dims.
These kernels restructure the same math so that every contraction is a
leading-axis einsum or a minor-axis 2-D dot — the two forms Mosaic
compiles into full-width MXU work:

    pass B (column phase): natural-layout row strips (TB, I', J'); per-
        row (fast) or per-axis (lse) shift; one swap to (I', TB, J');
        the c1 (h_z) contraction as a leading-axis einsum; the c2 (z)
        contraction as a single minor-axis (I*TB, J) @ (J, J) dot when
        the factor is shared.  Writes the midway field in (I, R, J)
        layout — the swap that the contraction needed anyway doubles as
        the layout change, so pass C needs no input transpose.
    pass C (row phase): contiguous (TCI, R, J) blocks of the midway
        field (TCI current-c1 slices, all rows); per-slice z maps as
        (R, J) @ (J, J) dots when c2 is batched over the current c1
        index (continuous SSY); both row contractions as leading-axis
        einsums around a VMEM swapaxes; separable epilogue -> log T(w),
        natural layout.

``precision="3x"`` evaluates every contraction as three native-bf16
MXU passes on hi/lo operand splits (the bf16_3x scheme: a*b ~ ah*bh +
ah*bl + al*bh with ah = bf16(a), al = bf16(a - ah); the dropped al*bl
term and split residuals are O(2^-17) relative, and all contraction
terms here are positive so there is no cancellation amplification) —
about half the cost of HIGHEST's six passes at near-f32 accuracy.

Exactly two HBM passes of the field per application, layout-stable
natural input/output.  Reference semantics: the same two-phase operand
algebra as ``operators/two_phase.py`` (discrete ``T_ssy``,
``/root/reference/code/ssy/discrete/ssy_wc_ratio.py:82-151``; continuous
quadrature ``ssy_wc_ratio_continuous.py:125-153``).

Coverage: requires a *shared* (non-batched) c1 factor.  Batched factors
whose conditioning is an exact diagonal conjugation of a shared matrix —
the baseline-normalized discrete SSY set — enter through
``operators/two_phase.conjugate_to_shared`` (shared factors + a
``mid_col`` log-space correction).  The truly-batched continuous-SSY
quadrature ``P_z`` (conditioning changes the interpolation geometry,
not just a weight) runs the block-diagonal c2 path.  Column groups too
large for whole-(I, J) row strips — the GCY Kronecker grouping's
512x256 — run the *deferred-c2* configuration: pass B contracts only
c1 on (TB, I, TJ) blocks (2-D grid over rows x column-blocks), and the
shared c2 contraction moves into pass C, where each (R, TC) block holds
whole J-slices and contracts them as one lead-merged (R*g, J) @ (J, J)
dot.  Same two HBM passes of the field; per-axis LSE shifts throughout
(GCY's theta = -36 puts its in-envelope grids near the f32 exp edge —
theta * column-span ~ 80 at the 25.2M-point Tauchen north star — so the
single-shift fast mode is not offered for deferred sets).
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

__all__ = ["make_streamed_T_log", "streamed_supported",
           "streamed_coverable", "build_b_call", "build_c_call",
           "build_c_call_pair"]

_TRX = {"fast": (jnp.exp, jnp.log, jnp.log1p),
        # "mixed": the hardware exp (measured ~6e-6 *relative* on v5e —
        # it passes through the LSE sums as ~6e-6 absolute in log units)
        # with the faithfully-rounded log/log1p (the hardware log's
        # ~1.1e-4 absolute is what sets the f32 one-application floor,
        # see ops/accurate.py).  ~Half the transcendental cost of
        # "accurate" at a ~1e-5-class per-application error.
        "mixed": (jnp.exp, _log_f32_impl, _log1p_f32_impl),
        "accurate": (_exp_f32_impl, _log_f32_impl, _log1p_f32_impl)}

_PRECISION = {"highest": jax.lax.Precision.HIGHEST,
              "default": jax.lax.Precision.DEFAULT,
              "3x": "3x"}


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_p(A, B, prec):
    """2-D dot with precision control; ``prec == "3x"`` runs three
    native-bf16 passes on hi/lo splits (see module docstring).  2-D only:
    Mosaic cannot shape-cast bf16 vectors, so the callers flatten in f32
    *before* the casts."""
    if prec == "3x":
        Ah, Al = _split_bf16(A)
        Bh, Bl = _split_bf16(B)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
        return d(Ah, Bh) + d(Ah, Bl) + d(Al, Bh)
    return jnp.dot(A, B, preferred_element_type=jnp.float32, precision=prec)


def _contract_lead(W, v3, prec):
    """Contract the leading axis of ``v3`` (m, a, b) with ``W`` (i, m) ->
    (i, a, b), as an explicit f32 flatten + one 2-D dot (the form Mosaic
    compiles into a single full-width MXU chain; measured ~4x faster
    than the middle-axis einsum form, and bf16-split compatible)."""
    m, a, b = v3.shape
    out = _dot_p(W, v3.reshape(m, a * b), prec)
    return out.reshape(W.shape[0], a, b)


# Scoped-VMEM budgets (bytes) for one strip/block: the kernels keep
# ~12-14x the block live (exp/log temporaries, matmul scratch,
# double-buffered I/O) against Mosaic's 16 MB scoped-vmem limit —
# measured 21.75 MB at a 1.57 MB pass-B block on v5e, so ~0.9 MB is the
# sweet spot.
_B_BLOCK_BYTES = 940_000
_C_BLOCK_BYTES = 940_000


def _deferred_b_config(shapes):
    """(TB, TJ) for the deferred-c2 pass B — (TB, I, TJ) blocks on a
    (R/TB, J/TJ) grid — or None.  TJ must be a 128-multiple divisor of J
    (lane tiling of the block and of pass C's (R, TC) -> (R*g, J)
    minor-dim split); maximise the block size within the VMEM budget."""
    n_r1, n_r2, I, J = shapes
    R = n_r1 * n_r2
    if J % 128 or I % 8:
        return None
    best = None
    for TJ in range(128, J + 1, 128):
        if J % TJ:
            continue
        unit = I * TJ * 4
        cap = _B_BLOCK_BYTES // unit
        if cap < 1:
            continue
        TB = _pick(R, cap)
        if best is None or TB * TJ > best[0] * best[1]:
            best = (TB, TJ)
    return best


def _pair_config(ops: TwoPhaseOperands):
    """Configuration of the *pair* kind (continuous-GCY operand sets,
    ``ops.pair_c2``), or None.

    Pass B is the deferred-c2 column phase (the (h_z (x) h_zpi) Kron
    factor is shared); pass C contracts the conditioned (z_pi, z) pair
    per c1 slice — z_pi' via the slice's (n_b, n_b) weights, then z'
    as per-current-z_pi (R, n_j) @ (n_j, n_j) dots with the
    (h_z, z_pi)-conditioned P_z slices streamed per block — followed by
    the linear-carry row phase.  Exact per-axis chain FLOPs (no joint
    (C2, C2) factor is ever built).

    Constraints: n_z % 128 == 0 (minor-dim splits/merges of the (z_pi,
    z) group), (n_hz * n_hzpi) % 8 == 0 (pass-B sublanes), n_r2 % 8 == 0
    (pass C's (R, TC) -> (r1, r2, ...) sublane split), and a power-of-2
    slice group g dividing n_hzpi (Mosaic's lane-broadcast lowering of
    the carry reshapes fails at non-pow2 g, as in the deferred
    configuration)."""
    n_r1, n_r2, IY, C2 = ops.shapes
    n_i, n_y, n_b, n_j = ops.pair_shapes
    if ops.has_mid:
        # mid_col sits between the two column contractions and is not
        # plumbed through the pair passes (same boundary as deferred).
        return None
    if n_j % 128 or n_r2 % 8 or IY % 8:
        return None
    R = n_r1 * n_r2
    bcfg = _deferred_b_config(ops.shapes)
    if bcfg is None:
        return None
    # g is bounded by Mosaic's SCOPED-VMEM STACK, not by the HBM block
    # budget: `_c_kernel_pair` runs its carry phase per C2-slice with
    # ~10 (R, C2)-sized f32 temporaries live per slice (exp, einsum,
    # the rescale/contract/swapaxes chain, the epilogue), and Mosaic
    # allocates kernel temporaries on the 16 MiB scoped-vmem stack
    # WITHOUT reuse across the unrolled slice loop (measured on TPU
    # v5e: the earlier block-wide 4-D carry formulation's stack grew
    # exactly additively — 37.88M at g=4).  Keep a margin under the
    # 16 MiB limit for the (R, TC) in/out pipeline blocks.
    _SLICE_TEMPS, _STACK_BUDGET = 10, 14_000_000
    gcap = _STACK_BUDGET // (_SLICE_TEMPS * R * C2 * 4)
    if gcap < 1:
        return None
    g, cand = 0, 1
    while cand <= gcap and n_y % cand == 0:
        g = cand
        cand *= 2
    if g < 1:
        return None
    return {"kind": "pair", "TB": bcfg[0], "TJ": bcfg[1], "g": g}


def _streamed_config(ops: TwoPhaseOperands):
    """Kernel configuration for this operand set, or None when the
    streamed kernels do not cover it.

    Returns ``{"kind": "full"}`` (pass B holds whole-(I, J) row strips,
    c2 contracted in B when shared / in C block-diagonally when batched),
    ``{"kind": "deferred", "TB": ?, "TJ": ?}`` (shared c2 deferred to
    pass C; see module docstring), or ``{"kind": "pair", ...}``
    (pair-factored batched c2 — continuous GCY; see
    :func:`_pair_config`).
    """
    n_r1, n_r2, n_c1, n_c2 = ops.shapes
    if getattr(ops, "pair_c2", None) is not None:
        return _pair_config(ops)
    if ops.c1_batched:
        return None
    if n_r2 % 8:
        # pass C's free (R, TC) <-> (n_r1, n_r2, TC) reshape splits the
        # sublane dim R into (n_r1, n_r2): layout-trivial only when the
        # new sublane dim n_r2 is tile-aligned; SSY grids (56) qualify.
        return None
    R = n_r1 * n_r2
    C = n_c1 * n_c2
    unit = n_c1 * n_c2 * 4
    if 8 * unit <= _B_BLOCK_BYTES:         # TB >= 8 row strips fit
        # Pass C needs a 128-aligned column block (Mosaic's minor-merge
        # rule applies to the row-contraction flattens too) that fits
        # the VMEM budget with all rows present.
        TC = _pick_tc(R, C, n_c2, ops.c2_batched)
        if TC % 128:
            return None
        if R * TC * 4 > 4 * _C_BLOCK_BYTES:
            return None
        if ops.c2_batched and (TC % n_c2 or (n_c1 % (TC // n_c2))):
            return None
        return {"kind": "full"}
    if ops.c2_batched or ops.has_mid:
        # Deferred-c2 needs a shared c2 factor; mid_col sits between the
        # two column contractions and is not plumbed across the passes.
        return None
    bcfg = _deferred_b_config(ops.shapes)
    if bcfg is None:
        return None
    TC = _pick_tc(R, C, n_c2, True, pow2_groups=True)  # whole J-slices
    if TC % 128 or TC % n_c2:
        return None
    if R * TC * 4 > 4 * _C_BLOCK_BYTES:
        return None
    return {"kind": "deferred", "TB": bcfg[0], "TJ": bcfg[1]}


def streamed_supported(ops: TwoPhaseOperands) -> bool:
    """True when the streamed kernels cover this operand set (either the
    full-strip or the deferred-c2 configuration)."""
    return _streamed_config(ops) is not None


def streamed_coverable(ops: TwoPhaseOperands):
    """The operand set the streamed kernels would run for ``ops`` —
    ``ops`` itself, its conjugated-shared form
    (``operators/two_phase.conjugate_to_shared``) when that lifts a
    batched factor into coverage — or None."""
    from ..operators.two_phase import conjugate_to_shared
    if streamed_supported(ops):
        return ops
    if ops.c1_batched or ops.c2_batched:
        conj = conjugate_to_shared(ops)
        if conj is not None and conj is not ops and streamed_supported(conj):
            return conj
    return None


def _warn_conjugated_f32_floor(conj: TwoPhaseOperands,
                               floor: float = -150.0) -> None:
    """Accuracy-envelope warning for conjugated-shared operand sets.

    The shared column factors are stored as f32 *linear-space* matrices,
    so entries whose log sits below f32's representable floor (~-87
    normal, ~-103 subnormal) flush to zero.  For a plain operator those
    entries are negligible transition probabilities, but a conjugated
    set's surrounding sub/add corrections (up to hundreds of log units
    on wide-Rouwenhorst GCY grids) can make them significant again, so a
    very wide factor log-range silently degrades f32 accuracy.  Measured
    one-application sup error vs f64 (normalized GCY, Rouwenhorst
    ladder): 1.3e-6 at factor log-range -144, 1.8e-4 at -182, 0.22 at
    -221 — warn past -150."""
    import warnings
    lo = 0.0
    for W in (conj.W_c1, conj.W_c2):
        W = np.asarray(W, np.float64)
        pos = W[W > 0]
        if pos.size:
            lo = min(lo, float(np.log(pos.min())))
    if lo < floor:
        warnings.warn(
            f"conjugated-shared factors span e^{lo:.0f}..e^0: entries "
            "below float32's representable floor flush to zero, and the "
            "conjugation corrections can make them significant — f32 "
            "accuracy degrades on this grid (measured: ~1e-6 sup error "
            "at factor log-range -144, 1.8e-4 at -182, 0.22 at -221). "
            "Use the per-axis normalized XLA chain (kernel='xla', "
            "baseline='loglinear'), discretization='tauchen', or "
            "float64.", stacklevel=3)


def _pick(n: int, cap: int, mult: int = 1) -> int:
    best = best_aligned = 0
    for d in range(1, n + 1):
        if n % d == 0 and d <= cap:
            best = d
            if d % mult == 0:
                best_aligned = d
    return best_aligned or best or 1


def _b_kernel(theta, prec, trx, mode, has_sub, has_mid, c2_here, *refs):
    """Column phase.  refs: ell, W_c1, [W_c2], [sub_row, sub_col],
    [mid_col] -> mid (TB, I, J) natural [+ s (TB, 1) in fast mode].

    The c1 contraction runs through the minor-axis form: a minor-pair
    swapaxes brings I' last, a (free) leading merge makes the operand
    2-D, and one dot contracts it — the only forms Mosaic lowers to
    full-width MXU work here (minor-dim merges need 128-multiple minors,
    which J = n_z usually is not; middle-axis einsums cost ~4x,
    measured)."""
    _exp, _log, _ = _TRX[trx]
    idx = 0
    ell_ref = refs[idx]; idx += 1
    wc1_ref = refs[idx]; idx += 1
    wc2_ref = None
    if c2_here:
        wc2_ref = refs[idx]; idx += 1
    if has_sub:
        subr_ref = refs[idx]; subc_ref = refs[idx + 1]; idx += 2
    if has_mid:
        mid_ref = refs[idx]; idx += 1
    out = refs[idx:]

    a = theta * ell_ref[:]                                   # (TB, I', J')
    if has_sub:
        a = a - subr_ref[:][:, :, None] - subc_ref[:][None, :, :]
    TB, I, J = a.shape

    def c1_minor(e):
        # (TB, I', J') -> contract I': swap minor pair, lead-merge, dot.
        v = jnp.swapaxes(e, 1, 2)                            # (TB, J', I')
        u = _dot_p(v.reshape(TB * J, I), wc1_ref[:].T, prec)
        return jnp.swapaxes(u.reshape(TB, J, I), 1, 2)       # (TB, I, J')

    def c2_minor(e):
        # J' is already minor: lead-merge + dot.
        return _dot_p(e.reshape(TB * I, J), wc2_ref[:].T,
                      prec).reshape(TB, I, J)

    if mode == "fast":
        s = jnp.max(jnp.max(a, axis=2, keepdims=True), axis=1,
                    keepdims=True)                           # (TB, 1, 1)
        u = c1_minor(_exp(a - s))
        if c2_here:
            u = c2_minor(u)
        out[0][:] = u
        out[1][:] = s[:, :, 0]
    else:
        m = jnp.max(a, axis=1, keepdims=True)                # over I'
        a = m + _log(c1_minor(_exp(a - m)))
        if has_mid:
            # Conjugated-shared correction between the two column
            # contractions (operators/two_phase.conjugate_to_shared).
            a = a + mid_ref[:][None, :, :]
        if c2_here:
            m = jnp.max(a, axis=2, keepdims=True)
            a = m + _log(c2_minor(_exp(a - m)))
        out[0][:] = a                                        # log domain


def _b_kernel_deferred(theta, prec, trx, has_sub, *refs):
    """Deferred-c2 column phase: contract c1 (I') only, on (TB, I, TJ)
    blocks of a (R/TB, J/TJ) grid.  refs: ell, W_c1, [sub_row, sub_col]
    -> log-domain block (per-axis LSE shift over the contracted I').

    Same minor-axis contraction form as :func:`_b_kernel`'s c1 step; the
    shared c2 contraction happens in pass C (:func:`_c_kernel` with
    ``c2_deferred``), so this kernel never needs the whole column group
    resident — the unlock for the GCY Kronecker grouping's 512x256
    columns."""
    _exp, _log, _ = _TRX[trx]
    idx = 0
    ell_ref = refs[idx]; idx += 1
    wc1_ref = refs[idx]; idx += 1
    if has_sub:
        subr_ref = refs[idx]; subc_ref = refs[idx + 1]; idx += 2
    out_ref = refs[idx]

    a = theta * ell_ref[:]                                   # (TB, I', TJ)
    TB, I, TJ = a.shape
    if has_sub:
        # sub_row arrives as the WHOLE (R, 1) array (a (TB, 1) block
        # would violate Mosaic's 8-sublane block rule at the small TB
        # the deferred VMEM budget forces); slice the local rows here.
        t = pl.program_id(0)
        subr = subr_ref[pl.ds(t * TB, TB), :]                # (TB, 1)
        a = a - subr[:, :, None] - subc_ref[:][None, :, :]
    m = jnp.max(a, axis=1, keepdims=True)                    # over I'
    v = jnp.swapaxes(_exp(a - m), 1, 2)                      # (TB, TJ, I')
    u = _dot_p(v.reshape(TB * TJ, I), wc1_ref[:].T, prec)
    u = jnp.swapaxes(u.reshape(TB, TJ, I), 1, 2)             # (TB, I, TJ)
    out_ref[:] = m + _log(u)


def build_b_call_deferred(*, R_rows: int, I: int, J: int, TB: int,
                          TJ: int, theta: float, prec, trx,
                          has_sub: bool, dtype,
                          interpret: bool = False):
    """Deferred-c2 pass-B ``pallas_call``: 2-D grid over (row blocks,
    column blocks), natural layout in and out.  Returns ``(call, TB)``."""
    full = lambda shape: pl.BlockSpec(
        shape, lambda t, u, _n=len(shape): tuple(_i32(0) for _ in range(_n)),
        memory_space=pltpu.VMEM)
    strip = pl.BlockSpec((TB, I, TJ),
                         lambda t, u: (_i32(t), _i32(0), _i32(u)),
                         memory_space=pltpu.VMEM)
    in_specs = [strip, full((I, I))]
    if has_sub:
        in_specs += [full((R_rows, 1)),
                     pl.BlockSpec((I, TJ), lambda t, u: (_i32(0), _i32(u)),
                                  memory_space=pltpu.VMEM)]
    call = pl.pallas_call(
        partial(_b_kernel_deferred, theta, prec, trx, has_sub),
        grid=(R_rows // TB, J // TJ),
        out_shape=jax.ShapeDtypeStruct((R_rows, I, J), dtype),
        in_specs=in_specs,
        out_specs=strip,
        interpret=interpret,
    )
    return call, TB


def _c_kernel(theta, beta, prec, trx, mode, shapes, TC, c2_batched,
              c2_deferred, *refs):
    """Row phase on (R, TC) blocks of the natural midway field (TC
    128-aligned; for batched c2, TC groups TC/J current-c1 slices whose
    z maps are one block-diagonal (TC, TC) dot; for deferred shared c2,
    the same TC/J whole slices contract as one lead-merged (R*g, J) @
    (J, J) dot).  refs: mid, [scale], [Z block-diag | W_c2], W_r1, W_r2,
    add_row, add_col strip, [S] -> out."""
    _exp, _log, _log1p = _TRX[trx]
    L, K, I, J = shapes
    R = L * K
    idx = 0
    mid_ref = refs[idx]; idx += 1
    if mode == "fast":
        scale_ref = refs[idx]; idx += 1
    z_ref = None
    if c2_batched or c2_deferred:
        z_ref = refs[idx]; idx += 1
    wr1_ref = refs[idx]; wr2_ref = refs[idx + 1]
    addr_ref = refs[idx + 2]; addc_ref = refs[idx + 3]
    idx += 4
    if mode == "fast":
        S_ref = refs[idx]; idx += 1
    out_ref = refs[idx]

    a = mid_ref[:]                                           # (R, TC)
    g = TC // J

    def zdot(e):
        if c2_deferred:
            # Shared c2 map on g whole J-slices: minor-dim split (TC is
            # a 128-multiple of J, itself 128-aligned) + one dot.
            return _dot_p(e.reshape(R * g, J), z_ref[:].T,
                          prec).reshape(R, TC)
        return _dot_p(e, z_ref[0].T, prec)                   # (R, TC)

    if mode == "fast":
        e = a * scale_ref[:]
        if c2_batched or c2_deferred:
            e = zdot(e)
        v = e.reshape(L, K, TC)
        v = _contract_lead(wr1_ref[:], v, prec)
        v = jnp.swapaxes(v, 0, 1)                            # (K', L, TC)
        v = _contract_lead(wr2_ref[:], v, prec)
        v = jnp.swapaxes(v, 0, 1)                            # (L, K, TC)
        lh = _log(v) + S_ref[0]
    else:
        # Linear-carry LSE: one elementwise exp into the first
        # contraction, one log out of the last, with the intermediate
        # renormalizations as *low-rank rescales* (the shift arrays are
        # one field axis smaller, so their exps are ~1/L the elementwise
        # cost) — measured ~2x cheaper than a log/exp pair per stage on
        # v5e, where the faithfully-rounded transcendentals dominate the
        # lse row phase.  Exactness: the rescale spreads span only ROW
        # axes (theta * row-span is a few log units for every operand
        # set — the column-axis spans, which reach the f32 exp edge on
        # wide grids, keep their exact per-axis/per-slice shifts), and
        # the intermediate linear values need only the row factors'
        # log-magnitude as exp headroom (probabilities or near-unit
        # folded factors for all current sets).
        if c2_deferred:
            # Per-(row, slice) shift over the contracted next-z group.
            w = a.reshape(R * g, J)
            m1 = jnp.max(w, axis=1, keepdims=True)           # (R*g, 1)
            u = _dot_p(_exp(w - m1), z_ref[:].T, prec)       # linear
            sh = m1.reshape(L, K, g)                         # (L, K, S)
            M2 = jnp.max(sh, axis=0, keepdims=True)          # (1, K, S)
            u = (u.reshape(L, K, g, J)
                 * _exp(sh - M2)[:, :, :, None]).reshape(L, K, TC)
            u = _contract_lead(wr1_ref[:], u, prec)
            M3 = jnp.max(M2, axis=1, keepdims=True)          # (1, 1, S)
            u = (u.reshape(L, K, g, J)
                 * _exp(M2 - M3)[:, :, :, None]).reshape(L, K, TC)
            u = jnp.swapaxes(u, 0, 1)                        # (K', L, TC)
            u = _contract_lead(wr2_ref[:], u, prec)
            v = jnp.swapaxes(u, 0, 1)                        # (L, K, TC)
            shift = jnp.broadcast_to(M3[:, :, :, None],
                                     (1, 1, g, J)).reshape(1, 1, TC)
            lh = _log(v) + shift
        elif c2_batched:
            # Joint shift per row over the TC-column group (coarser than
            # per-slice but still exact LSE renormalization).
            m1 = jnp.max(a, axis=1, keepdims=True)           # (R, 1)
            u = zdot(_exp(a - m1))                           # linear
            sh = m1.reshape(L, K, 1)
            M2 = jnp.max(sh, axis=0, keepdims=True)          # (1, K, 1)
            u = u.reshape(L, K, TC) * _exp(sh - M2)
            u = _contract_lead(wr1_ref[:], u, prec)
            M3 = jnp.max(M2, axis=1, keepdims=True)          # (1, 1, 1)
            u = u * _exp(M2 - M3)
            u = jnp.swapaxes(u, 0, 1)
            u = _contract_lead(wr2_ref[:], u, prec)
            v = jnp.swapaxes(u, 0, 1)
            lh = _log(v) + M3
        else:
            v = a.reshape(L, K, TC)
            m1 = jnp.max(v, axis=0, keepdims=True)           # (1, K, TC)
            u = _contract_lead(wr1_ref[:], _exp(v - m1), prec)
            M2 = jnp.max(m1, axis=1, keepdims=True)          # (1, 1, TC)
            u = u * _exp(m1 - M2)
            u = jnp.swapaxes(u, 0, 1)
            u = _contract_lead(wr2_ref[:], u, prec)
            v = jnp.swapaxes(u, 0, 1)
            lh = _log(v) + M2
    lh = lh + addr_ref[:][:, :, None] + addc_ref[:][0][None, None, :]
    out_ref[:] = _log1p(beta * _exp(lh / theta)).reshape(R, TC)


def build_b_call(*, R_rows: int, I: int, J: int, theta: float, prec, trx,
                 mode: str, has_sub: bool, c2_here: bool, dtype,
                 has_mid: bool = False, interpret: bool = False):
    """Pass-B ``pallas_call`` over ``R_rows`` field rows (full columns),
    natural layout in and out.

    Row-local: builds the per-shard column phase for the sharded tier
    (``parallel/shard_ops.streamed_shard_map_factory``) as well as the
    single-device phase.  Returns ``(call, TB)``.
    """
    TB = _pick(R_rows, max(1, _B_BLOCK_BYTES // (I * J * 4)), mult=8)
    full = lambda shape: pl.BlockSpec(
        shape, lambda c, _n=len(shape): tuple(_i32(0) for _ in range(_n)),
        memory_space=pltpu.VMEM)
    strip = pl.BlockSpec((TB, I, J),
                         lambda t: (_i32(t), _i32(0), _i32(0)),
                         memory_space=pltpu.VMEM)
    rowvec = pl.BlockSpec((TB, 1), lambda t: (_i32(t), _i32(0)),
                          memory_space=pltpu.VMEM)
    in_specs = [strip, full((I, I))]
    if c2_here:
        in_specs.append(full((J, J)))
    if has_sub:
        in_specs += [rowvec, full((I, J))]
    if has_mid:
        in_specs.append(full((I, J)))
    fast = mode == "fast"
    out_shape = ((jax.ShapeDtypeStruct((R_rows, I, J), dtype),
                  jax.ShapeDtypeStruct((R_rows, 1), dtype)) if fast
                 else jax.ShapeDtypeStruct((R_rows, I, J), dtype))
    out_specs = (strip, rowvec) if fast else strip
    call = pl.pallas_call(
        partial(_b_kernel, theta, prec, trx, mode, has_sub, has_mid,
                c2_here),
        grid=(R_rows // TB,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )
    return call, TB


def _pick_tc(R: int, C: int, J: int, c2_grouped: bool,
             pow2_groups: bool = False) -> int:
    """Pass-C column-block width: 128-aligned (Mosaic's minor-merge rule)
    and, when c2 contracts in pass C (batched or deferred), a multiple of
    J so blocks hold whole slices.

    ``pow2_groups`` (the deferred-c2 configuration) additionally forces
    the per-block slice count TC/J to a power of two: Mosaic fails to
    lower the deferred row stages' (R*g, J) <-> (L, K, g, J) minor-split
    reshapes with the accurate-exp chain at non-power-of-two g
    ("Not implemented: Lane broadcast" — measured: g = 4, 8 compile,
    g = 6, 12 do not, at identical R*g and J)."""
    unit = int(np.lcm(J, 128)) if c2_grouped else 128
    if C % unit:
        return C                       # single whole-C block (small C)
    cap = max(1, _C_BLOCK_BYTES // (R * 4 * unit))
    n = C // unit
    if pow2_groups:
        g = 1
        while g * 2 <= cap and n % (g * 2) == 0:
            g *= 2
        return unit * g
    return unit * _pick(n, cap)


def build_c_call(*, shapes, C_cols: int, theta: float, beta: float, prec,
                 trx, mode: str, c2_batched: bool, dtype,
                 c2_deferred: bool = False, interpret: bool = False):
    """Pass-C ``pallas_call`` over ``C_cols`` field columns (full rows),
    natural (R, C_cols) in and out.

    Column-local (the sharded tier's per-shard row phase).  For batched
    c2 the caller passes the block-diagonal z maps built by
    :func:`blockdiag_z`; for deferred shared c2 it passes W_c2 itself.
    Returns ``(call, TC)``.
    """
    L, K, I, J = shapes
    R = L * K
    TC = _pick_tc(R, C_cols, J, c2_batched or c2_deferred,
                  pow2_groups=c2_deferred)
    full = lambda shape: pl.BlockSpec(
        shape, lambda c, _n=len(shape): tuple(_i32(0) for _ in range(_n)),
        memory_space=pltpu.VMEM)
    colstrip = pl.BlockSpec((R, TC), lambda c: (_i32(0), _i32(c)),
                            memory_space=pltpu.VMEM)
    fast = mode == "fast"
    in_specs = [colstrip]
    if fast:
        in_specs.append(full((R, 1)))
    if c2_batched:
        in_specs.append(pl.BlockSpec(
            (1, TC, TC), lambda c: (_i32(c), _i32(0), _i32(0)),
            memory_space=pltpu.VMEM))
    elif c2_deferred:
        in_specs.append(full((J, J)))
    in_specs += [full((L, L)), full((K, K)), full((L, K)),
                 pl.BlockSpec((1, TC), lambda c: (_i32(0), _i32(c)),
                              memory_space=pltpu.VMEM)]
    if fast:
        # Explicit shape + i32 index map: a default SMEM spec's identity
        # map traces i64 under the package x64 config, which Mosaic
        # cannot legalize.
        in_specs.append(pl.BlockSpec((1,), lambda c: (_i32(0),),
                                     memory_space=pltpu.SMEM))
    call = pl.pallas_call(
        partial(_c_kernel, theta, beta, prec, trx, mode, shapes, TC,
                c2_batched, c2_deferred),
        grid=(C_cols // TC,),
        out_shape=jax.ShapeDtypeStruct((R, C_cols), dtype),
        in_specs=in_specs,
        out_specs=colstrip,
        interpret=interpret,
    )
    return call, TC


def _c_kernel_pair(theta, beta, prec, trx, shapes, pair_shapes, TC,
                   mid_ref, pzpi_ref, pzt_ref, wr1_ref, wr2_ref,
                   addr_ref, addc_ref, out_ref):
    """Pair-kind row phase: per-slice conditioned (z_pi', z') column
    contractions + the linear-carry row phase (same carry algebra as the
    deferred branch of :func:`_c_kernel`).

    Block c holds g whole (z_pi, z) slices — c1 indices q = c*g + s with
    a fixed current h_z (g divides n_hzpi, so i = q // n_hzpi is block-
    constant; the (1, n_b, n_j, n_j) ``pzt_ref`` block streams P_z's
    current-h_z slice, transposed host-side to (b, J, j), and the
    (g, n_b, n_b) ``pzpi_ref`` block streams the slices' z_pi weights
    pre-expanded per c1 slice — every in-kernel index is STATIC).  Per
    slice: one per-row LSE shift over the contracted (B', J') group,
    the tiny z_pi' contraction as a middle-axis einsum (always HIGHEST —
    its FLOPs are ~n_z/128 of one MXU pass), then n_b minor-axis
    (R, n_j) @ (n_j, n_j) dots for z' — current-z_pi-conditioned,
    exactly the factored chain's FLOPs — written straight into a scoped
    scratch (no lane concatenations)."""
    _exp, _log, _log1p = _TRX[trx]
    L, K, IY, C2 = shapes
    n_i, n_y, n_b, n_j = pair_shapes
    R = L * K
    g = TC // C2
    a = mid_ref[:]                                   # (R, TC) log domain
    pzt = pzt_ref[0]                                 # (n_b, n_j, n_j)

    # The carry phase runs PER C2-SLICE in pure 3-D (L, K, C2) layouts
    # (the row contractions and the per-slice LSE shift are column-
    # independent, so the g slices are separable).  A block-wide 4-D
    # (L, K, g, C2) formulation measured on TPU v5e lowers each
    # temporary with its g axis padded to 8 SUBLANES — ~4 MiB apiece at
    # (8, 16, *, 1024) regardless of g — and Mosaic allocates kernel
    # temporaries on the 16 MiB scoped-vmem stack WITHOUT reuse, so the
    # carry chain alone overflowed it (observed: 37.88M at g=4, 31.60M
    # at g=1, both compile failures at the 18.9M-point northstar case).
    # Exponent bias (see build_c_call_pair docstring): pass C's whole
    # z_pi-sum -> z-dot -> carry1 -> carry2 chain runs un-logged, so a
    # single f32 window (~87 decades below the running max) must hold
    # every contribution that matters.  GCY's theta = -36 times the
    # coarse-additive-baseline remainder span exceeds that at >=10^7
    # points — measured: the 18.9M northstar SA run was contracting at
    # ~0.98/iter and then underflowed a whole output group to 0, whose
    # log(-inf)/theta turned the field inf at iteration ~141.  Biasing
    # each exp stage by e^B and subtracting 3B after the log extends
    # the window by 3B decades at zero cost (f32 precision is
    # scale-free; the chain max stays <= e^{3B + sum-margins} ~ e^80).
    _B = 25.0

    def body(u_scr):
        for s in range(g):
            asl = a[:, s * C2:(s + 1) * C2]          # (R, C2)
            m1 = jnp.max(asl, axis=1, keepdims=True)   # (R, 1)
            e = _exp(asl - m1 + _B).reshape(R, n_b, n_j)  # next (B', J')
            # z_pi' contraction as SMEM-scalar-weighted sublane
            # accumulation, NOT an einsum over the sublane dim B:
            # Mosaic lowers that dot by materializing lane-padded
            # (R, n_j, B->128) transposes of e — ~8 MiB apiece at the
            # northstar shapes — which alone overflowed the 16 MiB
            # scoped-vmem stack (measured: 30.91M at g=1 with the
            # einsum; ~4M without).  n_b is ~8, so the VPU fma chain
            # is cheap next to the z' MXU dots below.
            for b in range(n_b):
                acc = pzpi_ref[s, b, 0] * e[:, 0, :]
                for B in range(1, n_b):
                    acc = acc + pzpi_ref[s, b, B] * e[:, B, :]
                u_scr[:, b * n_j:(b + 1) * n_j] = _dot_p(
                    acc, pzt[b], prec)
            # Linear-carry row phase (see _c_kernel's deferred branch),
            # on this slice's (L, K, C2) view.
            sh3 = m1.reshape(L, K, 1)
            M2 = jnp.max(sh3, axis=0, keepdims=True)     # (1, K, 1)
            u2 = u_scr[:].reshape(L, K, C2) * _exp(sh3 - M2 + _B)
            u2 = _contract_lead(wr1_ref[:], u2, prec)
            M3 = jnp.max(M2, axis=1, keepdims=True)      # (1, 1, 1)
            u2 = u2 * _exp(M2 - M3 + _B)
            u2 = jnp.swapaxes(u2, 0, 1)                  # (K', L, C2)
            u2 = _contract_lead(wr2_ref[:], u2, prec)
            v2 = jnp.swapaxes(u2, 0, 1)                  # (L, K, C2)
            lh = _log(v2) + (M3 - 3.0 * _B) + addr_ref[:][:, :, None]
            lh = lh + addc_ref[:][0][s * C2:(s + 1) * C2][None, None, :]
            out_ref[:, s * C2:(s + 1) * C2] = _log1p(
                beta * _exp(lh / theta)).reshape(R, C2)

    pl.run_scoped(body, pltpu.VMEM((R, C2), jnp.float32))


def pair_device_operands(ops, cast):
    """Host-side layout prep for the pair kind's pass-C operands — the
    ONE place that encodes `_c_kernel_pair`'s expected layouts:

    - ``PzT``: P_z transposed (i, j, b, J) -> (i, b, J, j), the kernel's
      per-current-z_pi z' MXU dot;
    - ``PzpiS``: P_zpi tiled so row q = i*n_y + y holds P_zpi[y] — the
      kernel indexes its (g, n_b, n_b) block statically (no dynamic VMEM
      slicing), which is only correct against exactly this tiling.

    Shared by the single-device factory and the sharded member builder
    (parallel/shard_ops) so the layout contract cannot drift.
    """
    import numpy as _np
    P_z, P_zpi = ops.pair_c2
    PzT = cast(_np.ascontiguousarray(
        _np.asarray(P_z, _np.float64).transpose(0, 2, 3, 1)))
    PzpiS = cast(_np.tile(_np.asarray(P_zpi, _np.float64),
                          (ops.pair_shapes[0], 1, 1)))
    return PzpiS, PzT


def build_c_call_pair(*, shapes, pair_shapes, C_cols: int, g: int,
                      theta: float, beta: float, prec, trx, dtype,
                      interpret: bool = False):
    """Pair-kind pass-C ``pallas_call`` (see :func:`_c_kernel_pair`).
    Operands: midway field (R, C_cols), per-slice z_pi weights
    (n_slices_local, n_b, n_b) streamed g slices per block, P_z
    transposed (n_i_local, n_b, n_j, n_j) streamed one current-h_z
    slice per block.  Returns ``(call, TC)``."""
    L, K, IY, C2 = shapes
    n_i, n_y, n_b, n_j = pair_shapes
    R = L * K
    TC = g * C2
    full = lambda shape: pl.BlockSpec(
        shape, lambda c, _n=len(shape): tuple(_i32(0) for _ in range(_n)),
        memory_space=pltpu.VMEM)
    colstrip = pl.BlockSpec((R, TC), lambda c: (_i32(0), _i32(c)),
                            memory_space=pltpu.VMEM)
    # SMEM: the kernel reads these as SCALAR weights for the sublane
    # accumulation (see _c_kernel_pair) — a VMEM residence would force
    # vector loads + lane broadcasts for each of the g*n_b*n_b scalars.
    pzpi_spec = pl.BlockSpec(
        (g, n_b, n_b), lambda c: (_i32(c), _i32(0), _i32(0)),
        memory_space=pltpu.SMEM)
    pzt_spec = pl.BlockSpec(
        (1, n_b, n_j, n_j),
        # lax.div on explicit-i32 operands, NOT `//`: under x64 the
        # Python divisor stages as an i64 literal inside floor_divide's
        # sign-correction jaxpr, and Mosaic's transform-func lowering
        # cannot lower the resulting i64->i32 convert (infinite
        # _convert_helper recursion).  c >= 0 and g, n_y > 0, so the
        # truncating div IS the floor div.
        lambda c: (jax.lax.div(c * _i32(g), _i32(n_y)),
                   _i32(0), _i32(0), _i32(0)),
        memory_space=pltpu.VMEM)
    in_specs = [colstrip, pzpi_spec, pzt_spec,
                full((L, L)), full((K, K)), full((L, K)),
                pl.BlockSpec((1, TC), lambda c: (_i32(0), _i32(c)),
                             memory_space=pltpu.VMEM)]
    call = pl.pallas_call(
        partial(_c_kernel_pair, theta, beta, prec, trx, shapes,
                pair_shapes, TC),
        grid=(C_cols // TC,),
        out_shape=jax.ShapeDtypeStruct((R, C_cols), dtype),
        in_specs=in_specs,
        out_specs=colstrip,
        interpret=interpret,
    )
    return call, TC


def blockdiag_z(W_c2: np.ndarray, TC: int) -> np.ndarray:
    """Group the batched (I, J, J) c2 factors into block-diagonal
    (TC, TC) maps, one per pass-C block: TC/J whole slices per block, so
    the per-slice z maps become a single full-width dot with the zero
    padding the MXU would spend on a J-wide contraction anyway."""
    I, J, _ = W_c2.shape
    g = TC // J
    n_blocks = I // g
    Z = np.zeros((n_blocks, TC, TC), np.float64)
    for b in range(n_blocks):
        for ci in range(g):
            sl = slice(ci * J, (ci + 1) * J)
            Z[b, sl, sl] = np.asarray(W_c2[b * g + ci], np.float64)
    return Z


def make_streamed_T_log(ops: TwoPhaseOperands, dtype=jnp.float32,
                        covered: TwoPhaseOperands = None,
                        mode: str = "auto", precision: str = "3x",
                        transcendentals: str = "accurate",
                        twin_precision: str = "highest",
                        interpret: bool = False) -> Callable:
    """Streamed two-pass operator from a two-phase operand set.

    Maps ell (4-D grid field, natural layout) -> log T(w); differentiable
    via a custom JVP through the XLA twin (``T.xla_twin``), like the
    round-2 kernels.

    mode "fast": one shift per field row (exact whenever the iterate's
    theta-range within a row fits exp's f32 range — plain SSY operands);
    "lse": per-axis log-sum-exp shifts (safe at any range — required for
    baseline-normalized operands whose folded factors the LSE steps
    renormalize); "auto" picks "fast" for plain operand sets.

    precision: "3x" (default — three native-bf16 passes on hi/lo splits,
    ~2^-17 relative contraction error at half HIGHEST's cost),
    "highest" (six passes, full f32), or "default" (one bf16 pass,
    ~1e-3 accuracy — throughput experiments only).

    transcendentals: "accurate" (default — faithfully-rounded f32
    exp/log, one-application error ~2e-6 vs f64 on the GCY deferred
    north-star class), "mixed" (hardware exp + accurate log — ~half the
    transcendental cost at ~6e-6; measured 2.58 vs 3.76 ms/app on the
    25.2M-point GCY grid), or "fast" (all hardware, ~1.6e-5).
    """
    if dtype != jnp.float32:
        raise ValueError("streamed kernels are the float32 tier")
    if covered is None:
        # ``covered`` lets the dispatch site pass its already-computed
        # coverable set (conjugate_to_shared is host work worth doing
        # once, not per call layer).
        covered = streamed_coverable(ops)
    if covered is None:
        raise ValueError("operand set not covered by the streamed "
                         "kernels (batched c1 factor or oversized column "
                         "group); use make_tiled_T_log")
    conjugated = ops is not covered
    ops = covered
    if conjugated:
        _warn_conjugated_f32_floor(ops)
    cfg = _streamed_config(ops)
    deferred = cfg["kind"] == "deferred"
    pair = cfg["kind"] == "pair"
    if mode == "auto":
        mode = "lse" if (ops.has_sub or deferred or pair) else "fast"
    if mode not in ("fast", "lse"):
        raise ValueError(f"unknown mode {mode!r}")
    if ops.has_mid and mode == "fast":
        raise ValueError("mid_col (conjugated-shared) operands need the "
                         "lse mode")
    if (deferred or pair) and mode == "fast":
        raise ValueError(
            "deferred-c2/pair operand sets run per-axis LSE only (the "
            "single-shift fast mode is unsafe at their column-group "
            "spans)")
    if transcendentals not in _TRX:
        raise ValueError(f"unknown transcendentals {transcendentals!r}")
    if precision not in _PRECISION:
        raise ValueError(f"unknown precision {precision!r}")
    prec = _PRECISION[precision]
    trx = transcendentals
    L, K, I, J = ops.shapes
    R, C = L * K, I * J
    theta_f = float(ops.theta)
    beta_f = float(ops.beta)
    c2_batched = ops.c2_batched

    cast = lambda a: jnp.asarray(a, dtype)
    W_r1, W_r2, W_c1 = map(cast, (ops.W_r1, ops.W_r2, ops.W_c1))
    # Pair sets carry a broadcast placeholder in W_c2 (the real factors
    # are ops.pair_c2); never cast/materialize it.
    W_c2 = None if pair else cast(ops.W_c2)
    add_row = cast(ops.add_row)
    add_colC = cast(np.asarray(ops.add_col, np.float64).reshape(1, C))
    has_sub = ops.has_sub
    if has_sub:
        sub_row = cast(np.asarray(ops.sub_row, np.float64).reshape(R, 1))
        sub_col = cast(ops.sub_col)
    has_mid = ops.has_mid
    if has_mid:
        mid_col = cast(ops.mid_col)

    fast = mode == "fast"
    b_args = [W_c1]
    if not (c2_batched or deferred):
        b_args.append(W_c2)
    if has_sub:
        b_args += [sub_row, sub_col]
    if has_mid and not (deferred or pair):
        b_args.append(mid_col)
    if deferred or pair:
        b_call, TB = build_b_call_deferred(
            R_rows=R, I=I, J=J, TB=cfg["TB"], TJ=cfg["TJ"], theta=theta_f,
            prec=prec, trx=trx, has_sub=has_sub, dtype=dtype,
            interpret=interpret)
    else:
        b_call, TB = build_b_call(R_rows=R, I=I, J=J, theta=theta_f,
                                  prec=prec, trx=trx, mode=mode,
                                  has_sub=has_sub,
                                  c2_here=not c2_batched, dtype=dtype,
                                  has_mid=has_mid, interpret=interpret)
    if pair:
        c_call, TC = build_c_call_pair(
            shapes=ops.shapes, pair_shapes=ops.pair_shapes, C_cols=C,
            g=cfg["g"], theta=theta_f, beta=beta_f, prec=prec, trx=trx,
            dtype=dtype, interpret=interpret)
        PzpiS, PzT = pair_device_operands(ops, cast)
        pair_args = [PzpiS, PzT]
        Z2 = None
    else:
        c_call, TC = build_c_call(shapes=ops.shapes, C_cols=C,
                                  theta=theta_f, beta=beta_f, prec=prec,
                                  trx=trx, mode=mode,
                                  c2_batched=c2_batched,
                                  c2_deferred=deferred, dtype=dtype,
                                  interpret=interpret)
        Z2 = (cast(blockdiag_z(np.asarray(ops.W_c2, np.float64), TC))
              if c2_batched else (W_c2 if deferred else None))

    def _primal(ell):
        ell = ell.astype(dtype).reshape(R, I, J)
        if fast:
            mid, s = b_call(ell, *b_args)
            S = jnp.max(s)
            scale = _TRX[trx][0](s - S)
            args = [mid.reshape(R, C), scale]
            if c2_batched:
                args.append(Z2)
            args += [W_r1, W_r2, add_row, add_colC, S.reshape(1)]
        else:
            mid = b_call(ell, *b_args)
            args = [mid.reshape(R, C)]
            if pair:
                args += pair_args
            elif c2_batched or deferred:
                args.append(Z2)
            args += [W_r1, W_r2, add_row, add_colC]
        return c_call(*args).reshape(ops.shapes)

    # twin_precision: the JVP tangent (= every Newton inner matvec)
    # runs through the XLA twin; "3x" halves its MXU cost at ~2^-17
    # relative — ample for inexact-Newton forcing tolerances.
    xla_twin = make_xla_two_phase_T(ops, dtype, precision=twin_precision)

    @jax.custom_jvp
    def T(ell):
        return _primal(ell)

    @T.defjvp
    def _jvp(primals, tangents):
        (ell,), (dell,) = primals, tangents
        dout = jax.jvp(xla_twin, (ell,), (dell,))[1]
        return _primal(ell), dout

    T.xla_twin = xla_twin
    T.strip_sizes = (TB, TC)
    T.mode = mode
    T.engine = ("streamed-pair" if pair
                else "streamed-deferred" if deferred else "streamed")
    T.precision = precision
    T.transcendentals = transcendentals
    if ops.baseline_log_w is not None:
        T.baseline_log_w = cast(ops.baseline_log_w)
    return T
