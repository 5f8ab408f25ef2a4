"""Two-phase (column-group / row-group) form of the 4-D log-space operators.

Every 4-D Koopmans operator in this package — discrete SSY (plain and
baseline-normalized) and continuous-SSY factored-quadrature (plain and
normalized) — is a chain of four per-axis log-sum-exp contractions plus a
separable epilogue.  Grouping the four state axes as rows (h_lam, h_c) and
columns (h_z, z) of a matrix view splits the chain into

    column phase:  contract next-h_z, then next-z      (touches only columns)
    row phase:     contract next-h_lam, then next-h_c  (touches only rows)

with the epilogue's additive terms separable into a row part and a column
part.  This module holds the grouping (:class:`TwoPhaseOperands`), builders
that assemble it for each operator instance, and a plain-XLA evaluator
(:func:`make_xla_two_phase_T`).  The point of the grouping is the *tiled
Pallas kernel* in ``kernels/tiled_discrete.py``: each phase needs only a
strip of the field (all columns of a few rows, or all rows of a few
columns), so the whole operator runs in two HBM-minimal passes — one read
and one write of the field per phase — instead of the ~10 passes of the
unfused per-axis einsum chain.

Reference semantics covered: discrete ``T_ssy`` (``/root/reference/code/
ssy/discrete/ssy_wc_ratio.py:82-151``) and the quadrature continuous
operator (``.../ssy_wc_ratio_continuous.py:125-153``), both in the exact
factored reformulation documented in ``operators/discrete_ssy.py`` /
``operators/continuous_common.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TwoPhaseOperands", "two_phase_operands_ssy",
           "two_phase_operands_ssy_continuous", "two_phase_operands_gcy",
           "conjugate_to_shared", "make_xla_two_phase_T"]


@dataclasses.dataclass(frozen=True)
class TwoPhaseOperands:
    """Operands of a two-phase 4-D log-space operator.

    Field layout: ell[r1, r2, c1, c2] with rows (r1, r2) and columns
    (c1, c2).  The operator is

        a   = theta*ell - sub_row ⊕ sub_col                (sub_* optional)
        a   = LSE-contract axis c1 with W_c1               (column phase)
        a   = LSE-contract axis c2 with W_c2
        a   = LSE-contract axis r1 with W_r1               (row phase)
        a   = LSE-contract axis r2 with W_r2
        out = log1p(beta * exp((a + add_row ⊕ add_col) / theta))

    ``W_c1`` is (n_c1, n_c1), or (n_c2, n_c1, n_c1) batched over the *next*
    c2 index (it applies before c2 is contracted); ``W_c2`` is
    (n_c2, n_c2), or (n_c1, n_c2, n_c2) batched over the *current* c1
    index.  All arrays are host float64 (full exponent range); the kernel
    builders cast.
    """

    shapes: Tuple[int, int, int, int]
    W_r1: np.ndarray
    W_r2: np.ndarray
    W_c1: np.ndarray
    W_c2: np.ndarray
    add_row: np.ndarray                 # (n_r1, n_r2)
    add_col: np.ndarray                 # (n_c1, n_c2)
    theta: float
    beta: float
    sub_row: Optional[np.ndarray] = None   # (n_r1, n_r2), theta*ell0 row part
    sub_col: Optional[np.ndarray] = None   # (n_c1, n_c2), theta*ell0 col part
    baseline_log_w: Optional[np.ndarray] = None  # full 4-D ell0
    mid_col: Optional[np.ndarray] = None   # (n_c1, n_c2), added between the
    #   two column contractions (conjugated-shared form, see
    #   :func:`conjugate_to_shared`)

    @property
    def c1_batched(self) -> bool:
        return self.W_c1.ndim == 3

    @property
    def c2_batched(self) -> bool:
        return self.W_c2.ndim == 3

    @property
    def has_sub(self) -> bool:
        return self.sub_row is not None

    @property
    def has_mid(self) -> bool:
        return self.mid_col is not None


def _warn_ssy_f32_envelope(model, disc) -> None:
    """Warn when theta * (within-column-group log-w span) exceeds exp's
    f32 range for the plain SSY operands (the GCY builder's guard,
    specialized: the SSY log-linear solution's (h_z, z) part is separable
    from the rows, so the span is exact and row-independent)."""
    import warnings

    from ..models.ssy import ssy_loglinear_factory

    co = ssy_loglinear_factory(model).coefficients
    h_z = np.asarray(disc.h_z_states, np.float64)
    phi_i = co["A_hz"] * (h_z * 2 * model.phi_z**2 + model.phi_z**2)
    psi_ij = co["A_z"] * np.asarray(disc.z_states, np.float64)   # (i, j)
    col = phi_i[:, None] + psi_ij
    span = float(col.max() - col.min())
    if abs(model.theta) * span > 85.0:
        warnings.warn(
            f"theta * (within-column-group log-w span) ~ "
            f"{abs(model.theta) * span:.0f} exceeds float32's exp range "
            "(~85): the f32 tiled SSY operator will produce -inf/NaN on "
            "this grid. Use baseline='loglinear', shrink the z / h_z "
            "axes (Rouwenhorst spans grow like sqrt(n)), use "
            "discretization='tauchen', or the float64 XLA chain.",
            stacklevel=3)


def two_phase_operands_ssy(model, disc, baseline: Optional[str] = None
                           ) -> TwoPhaseOperands:
    """Two-phase operands for the discrete SSY operator.

    ``baseline=None`` groups the plain factors (B_lam, Q_c | Q_hz, z_P);
    ``baseline="loglinear"`` groups the folded factors M1..M4 of the
    normalized operator (``discrete_ssy._ssy_normalized_arrays``).
    """
    from .discrete_ssy import _ssy_factors, _ssy_normalized_arrays

    n_l, n_k, n_i, n_j = disc.shapes
    theta, beta = model.theta, model.beta
    if baseline is None:
        B_lam, A2, A3 = _ssy_factors(model, disc)
        add_row = np.broadcast_to(
            np.log(np.asarray(A2, np.float64))[None, :], (n_l, n_k)).copy()
        add_col = np.log(np.asarray(A3, np.float64))
        # f32 range guard, mirroring the GCY builder's: the column phase
        # shifts over the joint (h_z, z) group, so if theta * (log-w span
        # within a column group) exceeds exp's f32 range, whole rows
        # underflow to exact zero -> -inf/NaN after one application.
        # The log-linear solution is the span proxy (its column part is
        # separable from the rows, so the span is row-independent).
        _warn_ssy_f32_envelope(model, disc)
        return TwoPhaseOperands(
            shapes=disc.shapes,
            W_r1=np.asarray(B_lam, np.float64),
            W_r2=np.asarray(disc.h_c_Q, np.float64),
            W_c1=np.asarray(disc.h_z_Q, np.float64),
            W_c2=np.asarray(disc.z_P, np.float64),
            add_row=add_row, add_col=add_col, theta=theta, beta=beta)
    if baseline != "loglinear":
        raise ValueError(f"unknown baseline {baseline!r}")
    arrs = _ssy_normalized_arrays(model, disc)
    # f32 range guard for the *normalized* operator: the baseline fold
    # moves the range pressure into the folded factors M3/M4, whose
    # entries carry exp(theta * Delta psi) weights.  Corner-probability
    # *underflow* (log-0 entries) is benign — those contributions are
    # genuinely negligible — but large positive entries eat the exp-range
    # headroom the LSE accumulations and the iterate's residual
    # theta*(ell - ell0) need: the NaN NORTHSTAR config (32,32,32,384)
    # measures log max(M3) ~ 69 (19 log units of headroom, and the
    # log-linear baseline is itself ~4.4 log units off at those corners,
    # so theta*residual ~ 70 overflows after one iteration), while known-
    # good wide grids measure <= ~22.  Warn above 45 — roughly half the
    # f32 exp range left as headroom.
    import warnings
    fac_max = max(float(np.log(arrs["M3"].max())),
                  float(np.log(arrs["M4"].max())))
    if fac_max > 45.0:
        warnings.warn(
            f"normalized-operator folded factors reach e^{fac_max:.0f}, "
            "leaving too little float32 exp-range headroom for the "
            "iterate's residual: the f32 tiled SSY operator is likely to "
            "produce inf/NaN on this grid. Shrink the z / h_z axes "
            "(Rouwenhorst ladders span ±sqrt(n-1) sigma), use "
            "discretization='tauchen' (fixed ±3 sigma span at any point "
            "count), or the float64 XLA chain.", stacklevel=2)
    sub_row = theta * (arrs["phi_l"][:, None] + arrs["phi_k"][None, :])
    sub_col = theta * (arrs["A0"] + arrs["phi_i"][:, None] + arrs["psi_ij"])
    ell0 = (arrs["A0"] + arrs["phi_l"][:, None, None, None]
            + arrs["phi_k"][None, :, None, None]
            + arrs["phi_i"][None, None, :, None]
            + arrs["psi_ij"][None, None, :, :])
    ops = TwoPhaseOperands(
        shapes=disc.shapes,
        W_r1=arrs["M1"], W_r2=arrs["M2"], W_c1=arrs["M3"], W_c2=arrs["M4"],
        add_row=sub_row + arrs["log_A2"][None, :],
        add_col=sub_col + arrs["log_A3"],
        theta=theta, beta=beta,
        sub_row=sub_row, sub_col=sub_col, baseline_log_w=ell0)
    # Lazy form of the batched column factors: the discrete z-grid is
    # multiplicatively separable (z_states = sigma_z[i] * ladder[j]), so
    # psi_ij = A_z sigma_i lambda_j and both folded factors are shared
    # matrices with a scalar-scaled exponent correction,
    #     W[b] = exp(logW0 + t[b] * D).
    # The tiled kernel materializes slices from these (n, n)+(n,) arrays
    # on the fly instead of holding the (B, n, n) tensor in VMEM — the
    # unlock for wide-z normalized grids (e.g. 384 z-points, where the
    # dense batched factor alone is ~19 MB).
    with np.errstate(divide="ignore"):
        log_Qhz = np.log(np.asarray(disc.h_z_Q, np.float64))
        log_zP = np.log(np.asarray(disc.z_P, np.float64))
    sigma = np.asarray(disc.sigma_z_states, np.float64)
    lam = np.asarray(disc.z_states, np.float64)[0] / sigma[0]
    phi_i = arrs["phi_i"]
    Az_theta = theta * arrs["A_z"]
    object.__setattr__(ops, "lazy_c1", (
        log_Qhz + theta * (phi_i[None, :] - phi_i[:, None]),
        Az_theta * (sigma[None, :] - sigma[:, None]),
        lam))
    object.__setattr__(ops, "lazy_c2", (
        log_zP,
        Az_theta * (lam[None, :] - lam[:, None]),
        sigma))
    return ops


def two_phase_operands_ssy_continuous(model, grids, degree: int = 5,
                                      baseline=None) -> TwoPhaseOperands:
    """Two-phase operands for the continuous factored-quadrature SSY
    operator (interp="pre"); optional separable baseline (see
    ``continuous_ssy._factored_arrays_ssy``)."""
    from .continuous_ssy import _factored_arrays_ssy

    shapes = tuple(len(g) for g in grids)
    n_l, n_k, n_i, n_j = shapes
    theta, beta = model.theta, model.beta
    arrs = _factored_arrays_ssy(model, grids, degree, baseline)
    log_A2 = np.asarray(arrs["log_A2"], np.float64)           # (k,)
    log_A3 = np.asarray(arrs["log_A3"], np.float64)           # (j,)
    add_row = np.broadcast_to(log_A2[None, :], (n_l, n_k)).copy()
    add_col = np.broadcast_to(log_A3[None, :], (n_i, n_j)).copy()
    sub_row = sub_col = ell0 = None
    if arrs["ell0_parts"] is not None:
        const0, phi_l, phi_k, phi_i, phi_j = arrs["ell0_parts"]
        sub_row = theta * (phi_l[:, None] + phi_k[None, :])
        sub_col = theta * (const0 + phi_i[:, None] + phi_j[None, :])
        add_row = add_row + sub_row
        add_col = add_col + sub_col
        ell0 = (const0 + phi_l[:, None, None, None]
                + phi_k[None, :, None, None]
                + phi_i[None, None, :, None] + phi_j[None, None, None, :])
    return TwoPhaseOperands(
        shapes=shapes,
        W_r1=np.asarray(arrs["P_lam"], np.float64),
        W_r2=np.asarray(arrs["P_c"], np.float64),
        W_c1=np.asarray(arrs["P_hz"], np.float64),
        W_c2=np.asarray(arrs["P_z"], np.float64),     # (i, j, j') batched
        add_row=add_row, add_col=add_col, theta=theta, beta=beta,
        sub_row=sub_row, sub_col=sub_col, baseline_log_w=ell0)


def two_phase_operands_gcy(model, disc) -> TwoPhaseOperands:
    """Two-phase operands for the *discrete six-state GCY* operator via
    Kronecker grouping.

    The discrete GCY transitions all use shared per-axis matrices (the
    conditioning of the z_pi and z chains lives entirely in the state
    ladders, ``discrete_gcy.discretize_gcy``), so the six-axis chain
    folds exactly into a 4-D two-phase operand set:

        rows:    r1 = h_c               W_r1 = Qc
                 r2 = h_lam             W_r2 = B_lam (payoff folded)
        columns: c1 = (z (x) z_pi)      W_c1 = zP (x) zpiP
                 c2 = (h_z (x) h_zpi)   W_c2 = Qhz (x) Qhzpi

    and the epilogue splits row/column with this grouping: log_A3
    depends on (z, z_pi, h_z, h_zpi) — a general (c1, c2) matrix — and
    log_A2 on h_c only.  The Kronecker products trade ~7x more
    multiplies for large MXU-friendly shapes ((n_z n_zpi)^2 instead of
    skinny per-axis factors); the HBM traffic (the bound at scale) is
    the same two passes per phase.  Putting the Kronecker groups on the
    *column* side keeps the minor block dimension large (n_hz*n_hzpi
    lanes) — the small (h_c, h_lam) group as lanes would pad 16 -> 128
    and waste ~8x of every column-phase block.

    The field view is ``ell[d, l, a, b, c, e]`` (h_c, h_lam leading);
    ``ops.perm`` / ``ops.inv_perm`` carry the transposition from the
    natural ``(z, z_pi, h_z, h_c, h_zpi, h_lam)`` layout.

    The baseline-normalized GCY variant does NOT fold this way (its
    per-axis factors gain cross-group conditioning) and stays on the XLA
    chain; the tiled kernel's per-axis LSE mode ("lse") is range-safe
    for the plain operator at any grid span.
    """
    from .discrete_gcy import _gcy_factors

    n_a, n_b, n_c, n_d, n_e, n_l = disc.shapes
    B_lam, A2, A3 = _gcy_factors(model, disc)
    kron = lambda X, Y: np.einsum(
        "aA,bB->abAB", np.asarray(X, np.float64),
        np.asarray(Y, np.float64)).reshape(X.shape[0] * Y.shape[0],
                                           X.shape[1] * Y.shape[1])
    W_c1 = kron(disc.z_P, disc.z_pi_P)
    W_c2 = kron(disc.h_z_Q, disc.h_zpi_Q)
    # log_A2 over d -> rows; log_A3 over current (a, b, c, e) -> columns.
    add_row = np.broadcast_to(
        np.log(np.asarray(A2, np.float64))[:, None], (n_d, n_l)).copy()
    add_col = np.log(np.asarray(A3, np.float64)).reshape(n_a * n_b,
                                                         n_c * n_e)
    # f32 range guard: the column phase shifts over the joint (z, z_pi)
    # and (h_z, h_zpi) groups; if theta * (log-linear ell span within a
    # column group) exceeds exp's f32 range, entire kron rows underflow
    # to exact zero -> -inf/NaN (docs/status.md #1 — GCY's theta = -36
    # hits this at ~2M+ point Rouwenhorst grids; the interaction
    # sigma_z(h_z) x z-ladder is non-separable, so no baseline fold can
    # remove it).  Wider grids are the f64 (XLA/CPU) tier.
    import warnings

    from .discrete_gcy import gcy_loglinear_parts
    ell0 = gcy_loglinear_parts(model, disc)["ell0"]
    span = float((ell0.max(axis=(0, 1, 2, 4))
                  - ell0.min(axis=(0, 1, 2, 4))).max())
    if abs(model.theta) * span > 85.0:
        warnings.warn(
            f"theta * (within-column-group log-w span) ~ "
            f"{abs(model.theta) * span:.0f} exceeds float32's exp range "
            "(~85): the f32 tiled GCY operator will produce -inf/NaN on "
            "this grid. Shrink the z / h_z axes (Rouwenhorst spans grow "
            "like sqrt(n)) or use the float64 XLA chain.", stacklevel=2)

    ops = TwoPhaseOperands(
        shapes=(n_d, n_l, n_a * n_b, n_c * n_e),
        W_r1=np.asarray(disc.h_c_Q, np.float64),
        W_r2=np.asarray(B_lam, np.float64),
        W_c1=W_c1, W_c2=W_c2,
        add_row=add_row, add_col=add_col,
        theta=model.theta, beta=model.beta)
    # Natural layout (a, b, c, d, e, l) -> view layout (d, l, a, b, c, e).
    object.__setattr__(ops, "perm", (3, 5, 0, 1, 2, 4))
    object.__setattr__(ops, "inv_perm", (2, 3, 4, 0, 5, 1))
    object.__setattr__(ops, "state_shapes", tuple(disc.shapes))
    return ops


def _difference_split(D: np.ndarray, rtol: float = 1e-12):
    """``u`` with ``D[i, m] = u[m] - u[i]`` (gauge ``u[0] = D[0, 0]``...
    any gauge — the constant cancels between the pre/post corrections),
    or None when ``D`` is not difference-separable."""
    u = np.asarray(D, np.float64)[0, :]
    resid = np.max(np.abs(D - (u[None, :] - u[:, None])))
    scale = max(1.0, float(np.max(np.abs(D))))
    return u if resid <= rtol * scale else None


def conjugate_to_shared(ops: TwoPhaseOperands
                        ) -> Optional[TwoPhaseOperands]:
    """Exact shared-factor form of a batched operand set whose lazy
    correction exponents are difference-separable.

    A batched factor of the form ``W[b] = exp(log0 + t[b] * D)`` with
    ``D[x, x'] = u[x'] - u[x]`` is a diagonal conjugation of the shared
    matrix ``W0 = exp(log0)``:

        W[b] = diag(e^{-t_b u}) @ W0 @ diag(e^{t_b u})

    so its log-space contraction is (pre-add ``G``, shared contraction,
    post-subtract ``G``) with the rank-1 correction ``G = u (x) t`` —
    elementwise adds that fold into ``sub_col`` (before c1), a single
    ``mid_col`` term (between the contractions), and ``add_col`` (after
    c2; column-constant adds commute through the row phase's LSE
    contractions).  For the baseline-normalized discrete SSY operands
    both corrections equal ``theta * psi`` exactly, so ``mid_col``
    vanishes and the normalized operator becomes a plain shared-factor
    two-phase chain — the unlock for the streamed kernel tier (and the
    wide-z grids whose dense batched factors blow the f32/VMEM budget).

    Returns None when a batched factor carries no difference-separable
    lazy form (e.g. the continuous-SSY quadrature ``P_z``, whose
    conditioning changes the interpolation geometry, not just a
    multiplicative weight).
    """
    n_r1, n_r2, n_c1, n_c2 = ops.shapes
    G1 = G2 = None
    W_c1, W_c2 = ops.W_c1, ops.W_c2
    if ops.c1_batched:
        lazy = getattr(ops, "lazy_c1", None)
        if lazy is None:
            return None
        log0, D, t = lazy
        u = _difference_split(np.asarray(D, np.float64))
        if u is None:
            return None
        G1 = u[:, None] * np.asarray(t, np.float64)[None, :]  # (c1, c2)
        W_c1 = np.exp(np.asarray(log0, np.float64))
    if ops.c2_batched:
        lazy = getattr(ops, "lazy_c2", None)
        if lazy is None:
            return None
        log0, D, t = lazy
        u = _difference_split(np.asarray(D, np.float64))
        if u is None:
            return None
        G2 = np.asarray(t, np.float64)[:, None] * u[None, :]  # (c1, c2)
        W_c2 = np.exp(np.asarray(log0, np.float64))
    if G1 is None and G2 is None:
        return ops                      # already shared
    zero = np.zeros((n_c1, n_c2), np.float64)
    G1 = zero if G1 is None else G1
    G2 = zero if G2 is None else G2
    sub_col = (zero if ops.sub_col is None
               else np.asarray(ops.sub_col, np.float64)) - G1
    sub_row = (np.zeros((n_r1, n_r2), np.float64) if ops.sub_row is None
               else ops.sub_row)
    mid = G2 - G1
    if np.max(np.abs(mid)) == 0.0:
        mid = None
    conj = dataclasses.replace(
        ops, W_c1=W_c1, W_c2=W_c2,
        sub_row=sub_row, sub_col=sub_col, mid_col=mid,
        add_col=np.asarray(ops.add_col, np.float64) - G2)
    for attr in ("perm", "inv_perm", "state_shapes"):
        if hasattr(ops, attr):
            object.__setattr__(conj, attr, getattr(ops, attr))
    return conj


def make_xla_two_phase_T(ops: TwoPhaseOperands, dtype=jnp.float32
                         ) -> Callable:
    """Plain-XLA evaluator of a two-phase operand set.

    Bit-for-bit the same math as the tiled Pallas kernels (same contraction
    order, same per-step shifts): the agreement oracle in the tests, the
    tangent body for the kernels' custom JVP, and the GSPMD-shardable
    fallback at sizes/backends the kernels don't cover.
    """
    n_r1, n_r2, n_c1, n_c2 = ops.shapes
    R, C = n_r1 * n_r2, n_c1 * n_c2
    cast = lambda a: jnp.asarray(a, dtype)
    W_r1, W_r2, W_c1, W_c2 = map(cast, (ops.W_r1, ops.W_r2, ops.W_c1,
                                        ops.W_c2))
    add = cast(ops.add_row[:, :, None]
               + ops.add_col.reshape(-1)[None, None, :])     # (r1, r2, C)
    sub = None
    if ops.has_sub:
        sub = cast(ops.sub_row.reshape(-1)[:, None, None]
                   + ops.sub_col[None, :, :])                # (R, c1, c2)
    mid = cast(ops.mid_col[None, :, :]) if ops.has_mid else None
    theta = jnp.asarray(ops.theta, dtype)
    beta = jnp.asarray(ops.beta, dtype)
    c1_sub = "jim,tmj->tij" if ops.c1_batched else "im,tmj->tij"
    c2_sub = "ijm,tim->tij" if ops.c2_batched else "jm,tim->tij"
    # True-f32 MXU passes (the TPU default demotes f32 operands to bf16,
    # a measured ~6x loss on one-application accuracy); accurate
    # transcendentals (the hardware f32 log costs ~1e-4 abs per stage,
    # see ops/accurate.py).
    hi = jax.lax.Precision.HIGHEST
    from ..ops.accurate import accurate_exp, accurate_log, accurate_log1p

    def T(ell):
        a = theta * ell.astype(dtype).reshape(R, n_c1, n_c2)
        if sub is not None:
            a = a - sub
        m = jnp.max(a, axis=1, keepdims=True)
        a = m + accurate_log(jnp.einsum(c1_sub, W_c1, accurate_exp(a - m),
                                        precision=hi))
        if mid is not None:
            a = a + mid
        m = jnp.max(a, axis=2, keepdims=True)
        a = m + accurate_log(jnp.einsum(c2_sub, W_c2, accurate_exp(a - m),
                                        precision=hi))
        b = a.reshape(n_r1, n_r2, C)
        m = jnp.max(b, axis=0, keepdims=True)
        b = m + accurate_log(jnp.einsum("lm,mkt->lkt", W_r1,
                                        accurate_exp(b - m), precision=hi))
        m = jnp.max(b, axis=1, keepdims=True)
        b = m + accurate_log(jnp.einsum("km,lmt->lkt", W_r2,
                                        accurate_exp(b - m), precision=hi))
        log_hwt = b + add
        return accurate_log1p(
            beta * accurate_exp(log_hwt / theta)).reshape(ops.shapes)

    return T
