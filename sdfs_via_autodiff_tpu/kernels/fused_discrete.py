"""Fused Pallas kernels for log-space Koopmans operators (two-matmul form).

The factored operators are chains of skinny per-axis matmuls with
elementwise exp/log around them.  XLA runs those as several HBM
round-trips, and ~10-wide matmuls pad poorly onto the 128x128 MXU.  The
kernels here re-associate each chain into two grouped contractions

    u = M1 @ v @ M2^T

(discrete SSY: M1 = kron(B_lam, Q_c), M2 = kron(Q_hz, z_P); continuous
SSY: M2 composes the h_z and conditional-z expectation matrices; discrete
GCY: triple Kronecker products per group) and fuse shifts, exponentials,
both matmuls, and the final log into a single VMEM-resident Pallas
program: one HBM read of ell, one HBM write of T(ell).  The grouped
matrices cost O(N*(rows+cols)) FLOPs instead of O(N*sum n_i) — more
arithmetic, but on MXU-shaped operands with zero intermediate HBM
traffic; the tradeoff favors this form exactly at VMEM-resident sizes
(docs/design.md), which is the kernels' domain.

Mosaic supports f32/bf16, not the f64 double-float emulation, so this is
the float32 fast path (log-space f32 holds ~1e-7 *relative* accuracy on w;
the f64 XLA path remains the parity tier).  Newton works through it via a
custom JVP whose tangent uses transposable XLA einsums (reverse-mode
therefore also works).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from ..ops.accurate import (accurate_exp, accurate_log,
                            accurate_log1p)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.ssy import SSY
from ..operators.discrete_ssy import SSYDiscretization, _ssy_factors

__all__ = ["make_fused_T_log_ssy", "kron_operands_ssy",
           "kron_operands_ssy_continuous", "make_fused_T_from_operands",
           "make_fused_T_log_ssy_continuous", "make_xla_T_from_operands",
           "kron_operands_gcy", "make_fused_T_log_gcy",
           "kron_operands_gcy_continuous",
           "make_fused_T_log_gcy_continuous"]

# Keep the whole working set comfortably inside ~16 MB of VMEM.
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def kron_operands_ssy(model: SSY, disc: SSYDiscretization, dtype=jnp.float32):
    """(M1, M2T, log_kappa) for the kron-form contraction, as ``dtype``.

    log_kappa[(l k), (i j)] = log A2[k] + log A3[i, j] broadcast to the
    matrix view of the state space.
    """
    B_lam, A2, A3 = _ssy_factors(model, disc)
    n_l, n_k, n_i, n_j = disc.shapes
    M1 = jnp.kron(B_lam, disc.h_c_Q)
    M2 = jnp.kron(disc.h_z_Q, disc.z_P)
    log_kap = (jnp.log(A2)[None, :, None, None]
               + jnp.log(A3)[None, None, :, :]
               + jnp.zeros((n_l, 1, 1, 1)))
    log_kap = jnp.broadcast_to(log_kap, disc.shapes)
    log_kap = log_kap.reshape(n_l * n_k, n_i * n_j)
    return (M1.astype(dtype), M2.T.astype(dtype), log_kap.astype(dtype))


def _fused_kernel(theta, beta, has_sub, *refs):
    # Two kron contractions with per-step log-sum-exp shifts: exact in f32
    # for any dynamic range of theta*ell (a single global shift overflows
    # once the range passes exp's f32 limit — see ops/contract.py).
    # With has_sub (baseline-normalized operands), the iterate is reduced
    # by the separable baseline theta*ell0 before the chain; kap carries
    # the matching +theta*ell0 epilogue term.
    if has_sub:
        ell_ref, m1_ref, m2t_ref, kap_ref, sub_ref, out_ref = refs
    else:
        ell_ref, m1_ref, m2t_ref, kap_ref, out_ref = refs
    from ..ops.accurate import _exp_f32_impl, _log1p_f32_impl, _log_f32_impl
    p = theta * ell_ref[:]
    if has_sub:
        p = p - sub_ref[:]
    sh1 = jnp.max(p, axis=0, keepdims=True)
    u = jnp.dot(m1_ref[:], _exp_f32_impl(p - sh1),
                preferred_element_type=jnp.float32)
    log_u = sh1 + _log_f32_impl(u)
    sh2 = jnp.max(log_u, axis=1, keepdims=True)
    u = jnp.dot(_exp_f32_impl(log_u - sh2), m2t_ref[:],
                preferred_element_type=jnp.float32)
    log_hwt = sh2 + _log_f32_impl(u) + kap_ref[:]
    out_ref[:] = _log1p_f32_impl(beta * _exp_f32_impl(log_hwt / theta))


def kron_operands_ssy_continuous(model: SSY, grids, degree: int = 5,
                                 dtype=jnp.float32):
    """(M1, M2T, log_kappa) for the *continuous* factored operator
    (quadrature, pre-power interpolation) in the same two-matmul form.

    M1 = kron(P_lam, P_c); the (h_z, z) block composes the h_z expectation
    matrix with the (i, j)-conditional z expectation matrix into one dense
    (n_i*n_j, n_i*n_j) operand C[(i,j),(i',j')] = P_hz[i,i'] * P_z[i,j,j'].
    """
    from ..operators.continuous_common import expectation_matrix
    from ..operators.continuous_ssy import _log_kappa_ssy
    from ..ops.quadrature import gauss_hermite_normal

    theta = model.theta
    m = model
    h_lam_grid, h_c_grid, h_z_grid, z_grid = grids
    eta, omega = map(jnp.asarray, gauss_hermite_normal(degree))
    P_lam = expectation_matrix(h_lam_grid, m.rho_lam * h_lam_grid, m.s_lam,
                               eta, omega,
                               payoff=lambda xn: jnp.exp(theta * xn))
    P_c = expectation_matrix(h_c_grid, m.rho_c * h_c_grid, m.s_c, eta, omega)
    P_hz = expectation_matrix(h_z_grid, m.rho_z * h_z_grid, m.s_z, eta, omega)
    sigma_z = m.phi_z * jnp.exp(h_z_grid)
    P_z = expectation_matrix(z_grid,
                             jnp.broadcast_to(m.rho * z_grid,
                                              (len(h_z_grid), len(z_grid))),
                             sigma_z[:, None], eta, omega)
    n_i, n_j = len(h_z_grid), len(z_grid)
    C = P_hz[:, None, :, None] * P_z[:, :, None, :]       # (i, j, i', j')
    M1 = jnp.kron(P_lam, P_c)
    M2T = C.reshape(n_i * n_j, n_i * n_j).T
    n_l, n_k = len(h_lam_grid), len(h_c_grid)
    log_kap = _log_kappa_ssy(m, h_c_grid[:, None], z_grid[None, :])  # (k, j)
    full = jnp.broadcast_to(log_kap[None, :, None, :],
                            (n_l, n_k, n_i, n_j))
    return (M1.astype(dtype), M2T.astype(dtype),
            full.reshape(n_l * n_k, n_i * n_j).astype(dtype))


def make_fused_T_from_operands(M1, M2T, log_kap, theta, beta, shapes,
                               rows, cols, dtype=jnp.float32, sub=None,
                               interpret: bool = False) -> Callable:
    """Fused two-matmul log-space T from prebuilt operands.

    Shared machinery for the discrete and continuous SSY kernels; carries
    a custom JVP (XLA-side tangent, transposable — reverse-mode works).
    """
    working = (rows * cols * 4 + rows * rows + cols * cols) * np.dtype(
        jnp.float32).itemsize
    if working > _VMEM_BUDGET_BYTES:
        raise ValueError(
            f"state space {shapes} needs ~{working/2**20:.1f} MiB VMEM; "
            "use the XLA factored operator for grids this large")

    has_sub = sub is not None
    kernel = partial(_fused_kernel, theta, beta, has_sub)
    n_in = 5 if has_sub else 4
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def _primal(ell_mat):
        args = (ell_mat, M1, M2T, log_kap) + ((sub,) if has_sub else ())
        return call(*args)

    @jax.custom_jvp
    def T(ell):
        ell_mat = ell.reshape(rows, cols).astype(dtype)
        return _primal(ell_mat).reshape(shapes)

    @T.defjvp
    def _jvp(primals, tangents):
        (ell,), (dell,) = primals, tangents
        ell_mat = ell.reshape(rows, cols).astype(dtype)
        dell_mat = dell.reshape(rows, cols).astype(dtype)
        out = _primal(ell_mat)
        # Tangent in XLA (transposable, so reverse-mode works too),
        # mirroring the kernel's per-step LSE shifts (shift maxima are
        # constants a.e. so they carry no tangent; a constant sub shifts
        # the primal only):
        p = theta * ell_mat - (sub if sub is not None else 0.0)
        sh1 = jax.lax.stop_gradient(jnp.max(p, axis=0, keepdims=True))
        e1 = jnp.exp(p - sh1)
        s1 = M1 @ e1
        dl1 = (M1 @ (e1 * (theta * dell_mat))) / s1
        log_u1 = sh1 + jnp.log(s1)
        sh2 = jax.lax.stop_gradient(jnp.max(log_u1, axis=1, keepdims=True))
        e2 = jnp.exp(log_u1 - sh2)
        s2 = e2 @ M2T
        dlu = ((e2 * dl1) @ M2T) / s2
        dout = (1.0 - jnp.exp(-out)) * dlu / theta
        return (out.reshape(shapes),
                dout.reshape(shapes).astype(dtype))

    return T


def make_fused_T_log_ssy(model: SSY,
                         disc: SSYDiscretization,
                         dtype=jnp.float32,
                         interpret: bool = False) -> Callable:
    """Fused log-space T for the *discrete* SSY operator (kron operands).

    Maps ell (n_l, n_k, n_i, n_j) -> T-image, differentiable (custom JVP).
    """
    n_l, n_k, n_i, n_j = disc.shapes
    M1, M2T, log_kap = kron_operands_ssy(model, disc, dtype)
    return make_fused_T_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, disc.shapes,
        n_l * n_k, n_i * n_j, dtype=dtype, interpret=interpret)


def make_fused_T_log_ssy_continuous(model: SSY, grids, degree: int = 5,
                                    dtype=jnp.float32,
                                    interpret: bool = False) -> Callable:
    """Fused log-space T for the *continuous* SSY operator (quadrature,
    pre-power interpolation) — same two-matmul kernel with the composed
    (h_z, z) expectation operand."""
    shapes = tuple(len(g) for g in grids)
    n_l, n_k, n_i, n_j = shapes
    M1, M2T, log_kap = kron_operands_ssy_continuous(model, grids, degree,
                                                    dtype)
    return make_fused_T_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, shapes,
        n_l * n_k, n_i * n_j, dtype=dtype, interpret=interpret)


def make_xla_T_from_operands(M1, M2T, log_kap, theta, beta, shapes,
                             rows, cols, dtype=jnp.float32) -> Callable:
    """Two-matmul log-space T in plain XLA (no Pallas, no VMEM cap).

    Same math as the fused kernel — two dense contractions with per-step
    LSE shifts — but lowered through ordinary jnp ops, so it runs at any
    size, shards under GSPMD, and differentiates natively.  Also a
    workaround for backends where the *batched* per-axis einsum's JVP is
    fragile: this form contains only plain matmuls.
    """
    theta_c = jnp.asarray(theta, dtype)

    def T(ell):
        p = theta_c * ell.reshape(rows, cols).astype(dtype)
        sh1 = jnp.max(p, axis=0, keepdims=True)
        u = M1 @ accurate_exp(p - sh1)
        log_u = sh1 + accurate_log(u)
        sh2 = jnp.max(log_u, axis=1, keepdims=True)
        u = accurate_exp(log_u - sh2) @ M2T
        log_hwt = sh2 + accurate_log(u) + log_kap
        return accurate_log1p(
            beta * accurate_exp(log_hwt / theta_c)).reshape(shapes)

    return T


def kron_operands_gcy(model, disc, dtype=jnp.float32):
    """(M1, M2T, log_kappa) for the discrete GCY operator in two-matmul
    form: rows group (z, z_pi, h_z), columns group (h_c, h_zpi, h_lam).

    All conditional chains share their transition matrices (see
    ``operators/discrete_gcy.py``), so both groups are pure Kronecker
    products:  M1 = zP (x) zpiP (x) Qhz,  M2 = Qc (x) Qhzpi (x) B_lam.
    """
    from ..operators.discrete_gcy import _gcy_factors

    B_lam, A2, A3 = _gcy_factors(model, disc)
    n_a, n_b, n_c, n_d, n_e, n_l = disc.shapes
    M1 = jnp.kron(disc.z_P, jnp.kron(disc.z_pi_P, disc.h_z_Q))
    M2 = jnp.kron(disc.h_c_Q, jnp.kron(disc.h_zpi_Q, B_lam))
    # log kappa over (a,b,c,d,e,l): A2 over d, A3 over (a,b,c,e).
    log_kap = (jnp.log(A2)[None, None, None, :, None, None]
               + jnp.log(A3)[:, :, :, None, :, None]
               + jnp.zeros((1, 1, 1, 1, 1, n_l)))
    log_kap = jnp.broadcast_to(log_kap, disc.shapes)
    log_kap = log_kap.reshape(n_a * n_b * n_c, n_d * n_e * n_l)
    return (M1.astype(dtype), M2.T.astype(dtype), log_kap.astype(dtype))


def make_fused_T_log_gcy(model, disc, dtype=jnp.float32,
                         interpret: bool = False) -> Callable:
    """Fused log-space T for the discrete GCY operator."""
    n_a, n_b, n_c, n_d, n_e, n_l = disc.shapes
    M1, M2T, log_kap = kron_operands_gcy(model, disc, dtype)
    return make_fused_T_from_operands(
        M1, M2T, log_kap, model.theta, model.beta, disc.shapes,
        n_a * n_b * n_c, n_d * n_e * n_l, dtype=dtype, interpret=interpret)


def kron_operands_gcy_continuous(model, grids, degree: int = 5,
                                 baseline=None, dtype=jnp.float32):
    """(M1, M2T, log_kappa, ell0) for the *continuous* GCY factored
    operator (quadrature, pre-power interp) in two-matmul form.

    Grid order (l, k, i, y, j, b) = (h_lam, h_c, h_z, h_zpi, z, z_pi):
    rows group (l, k); the column group must hold all four conditioned
    axes — z' conditions on (h_z, z, z_pi) and z_pi' on (h_zpi, z_pi)
    (reference ``gcy_wc_ratio_continuous.py:77-115``) — so the column
    operand is the dense composition

        D[(i,y,j,b), (I,Y,J,B)] =
            P_hz[i,I] P_hzpi[y,Y] P_zpi[y,b,B] P_z[i,j,b,J],

    O((n_i n_y n_j n_b)^2) memory: a VMEM-resident-scale form (~6-7 points
    per axis).  ``baseline`` (strongly recommended for f32 — theta * log-w
    range is ~200 on these grids) folds a separable baseline into the
    P matrices before composing and returns ell0 = theta-weighted baseline
    as a (rows, cols) subtraction operand.
    """
    import numpy as np

    from ..operators.continuous_common import expectation_matrix
    from ..ops.quadrature import gauss_hermite_normal

    m = model
    theta = m.theta
    h_lam_g, h_c_g, h_z_g, h_zpi_g, z_g, z_pi_g = grids
    eta, omega = map(jnp.asarray, gauss_hermite_normal(degree))
    P_lam = expectation_matrix(h_lam_g, m.rho_lam * h_lam_g, m.s_lam,
                               eta, omega,
                               payoff=lambda xn: jnp.exp(theta * xn))
    P_c = expectation_matrix(h_c_g, m.rho_c * h_c_g, m.s_c, eta, omega)
    P_hz = expectation_matrix(h_z_g, m.rho_z * h_z_g, m.s_z, eta, omega)
    P_hzpi = expectation_matrix(h_zpi_g, m.rho_zpi * h_zpi_g, m.s_zpi,
                                eta, omega)
    sigma_z = m.phi_z * jnp.exp(h_z_g)
    sigma_zpi = m.phi_zpi * jnp.exp(h_zpi_g)
    P_zpi = expectation_matrix(
        z_pi_g, jnp.broadcast_to(m.rho_pipi * z_pi_g,
                                 (len(h_zpi_g), len(z_pi_g))),
        sigma_zpi[:, None], eta, omega)
    mean_z = (m.rho * z_g[None, :, None] + m.rho_pi * z_pi_g[None, None, :])
    mean_z = jnp.broadcast_to(mean_z, (len(h_z_g), len(z_g), len(z_pi_g)))
    P_z = expectation_matrix(z_g, mean_z, sigma_z[:, None, None], eta, omega)

    n_l, n_k = len(h_lam_g), len(h_c_g)
    n_i, n_y, n_j, n_b = len(h_z_g), len(h_zpi_g), len(z_g), len(z_pi_g)
    shapes = (n_l, n_k, n_i, n_y, n_j, n_b)
    rows, cols = n_l * n_k, n_i * n_y * n_j * n_b

    ell0_mat = None
    if baseline is not None:
        from ..operators.continuous_common import (
            normalize_expectation_matrix)
        if baseline == "loglinear":
            from ..models.gcy import gcy_loglinear_factory
            co = gcy_loglinear_factory(m).coefficients
            phi = [co["A_hlam"] * np.asarray(h_lam_g, np.float64),
                   co["A_hc"] * (np.asarray(h_c_g, np.float64) * 2 * m.phi_c**2
                                 + m.phi_c**2),
                   co["A_hz"] * (np.asarray(h_z_g, np.float64) * 2 * m.phi_z**2
                                 + m.phi_z**2),
                   co["A_hzpi"] * (np.asarray(h_zpi_g, np.float64)
                                   * 2 * m.phi_zpi**2 + m.phi_zpi**2),
                   co["A_z"] * np.asarray(z_g, np.float64),
                   co["A_zpi"] * np.asarray(z_pi_g, np.float64)]
            const0 = co["A0"]
        else:
            const0, profs = baseline
            phi = [np.asarray(p_, np.float64) for p_ in profs]
        phi_l, phi_k, phi_i, phi_y, phi_j, phi_b = phi
        P_lam = jnp.asarray(normalize_expectation_matrix(
            P_lam, phi_l, phi_l, theta))
        P_c = jnp.asarray(normalize_expectation_matrix(
            P_c, phi_k, phi_k, theta))
        P_hz = jnp.asarray(normalize_expectation_matrix(
            P_hz, phi_i, phi_i, theta))
        P_hzpi = jnp.asarray(normalize_expectation_matrix(
            P_hzpi, phi_y, phi_y, theta))
        P_zpi = jnp.asarray(normalize_expectation_matrix(
            P_zpi, phi_b, np.broadcast_to(phi_b, P_zpi.shape[:-1]), theta))
        cur_j = np.broadcast_to(phi_j[None, :, None], P_z.shape[:-1])
        P_z = jnp.asarray(normalize_expectation_matrix(
            P_z, phi_j, cur_j, theta))
        row0 = phi_l[:, None] + phi_k[None, :]
        col0 = (const0 + phi_i[:, None, None, None]
                + phi_y[None, :, None, None] + phi_j[None, None, :, None]
                + phi_b[None, None, None, :])
        ell0_mat = (row0.reshape(rows, 1) + col0.reshape(1, cols))

    # Compose the column operand in host float64 (exponent range).
    D = np.einsum("iI,yY,ybB,ijbJ->iyjbIYJB",
                  np.asarray(P_hz, np.float64),
                  np.asarray(P_hzpi, np.float64),
                  np.asarray(P_zpi, np.float64),
                  np.asarray(P_z, np.float64)).reshape(cols, cols)
    M1 = np.kron(np.asarray(P_lam, np.float64), np.asarray(P_c, np.float64))

    # kappa from the canonical helper (operators/continuous_gcy) so a
    # recalibration there cannot silently diverge from this kernel:
    # log kappa(h_c, z) is additively separable, so the row/column Kron
    # split below is exact — log_A2 carries the h_c-dependence relative
    # to h_c = 0, log_A3 the rest (their SUM is kappa bit-for-bit).
    from ..operators.continuous_gcy import _log_kappa_gcy
    zero = jnp.zeros(())
    log_A2 = np.asarray(_log_kappa_gcy(m, jnp.asarray(h_c_g), zero)
                        - _log_kappa_gcy(m, zero, zero), np.float64)
    log_A3 = np.asarray(_log_kappa_gcy(m, zero, jnp.asarray(z_g)),
                        np.float64)
    kap = (np.zeros((n_l, 1)) + log_A2[None, :]).reshape(rows, 1) + \
        np.broadcast_to(log_A3[None, None, :, None],
                        (n_i, n_y, n_j, n_b)).reshape(1, cols)
    if ell0_mat is not None:
        kap = kap + theta * ell0_mat
    return (jnp.asarray(M1, dtype), jnp.asarray(D.T, dtype),
            jnp.asarray(kap, dtype), shapes, rows, cols,
            None if ell0_mat is None else jnp.asarray(theta * ell0_mat,
                                                      dtype))


def make_fused_T_log_gcy_continuous(model, grids, degree: int = 5,
                                    baseline="loglinear",
                                    dtype=jnp.float32,
                                    interpret: bool = False) -> Callable:
    """Fused log-space T for the *continuous* GCY factored operator
    (quadrature, pre-power interp) — two-matmul form with the four
    conditioned axes composed into one dense column operand.  Baseline
    normalization defaults on: theta * (log-w range) ~ 200 on these grids
    exceeds f32's exponential range without it."""
    (M1, M2T, kap, shapes, rows, cols,
     sub) = kron_operands_gcy_continuous(model, grids, degree, baseline,
                                         dtype)
    T = make_fused_T_from_operands(
        M1, M2T, kap, model.theta, model.beta, shapes, rows, cols,
        dtype=dtype, sub=sub, interpret=interpret)
    if sub is not None:
        T.baseline_log_w = (sub / model.theta).reshape(shapes)
    return T
