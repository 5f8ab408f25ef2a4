"""Matrix-free spectral checks for existence/uniqueness.

The fixed point exists and is unique iff beta * r(H)^(1/theta) < 1
(Stachurski-Zhang 2022; reference ``paper/autosdfs.tex:447-450``).  The
reference can only check this by materializing dense H on tiny grids
(``temp_ssy.py``); here r(H) comes from power iteration through the
*factored* operator — H is nonnegative and irreducible, so the Perron
root is reached from a positive start — making the condition checkable at
any grid size on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["power_iteration", "existence_check", "stability_decomposition",
           "stability_exponent_mc"]


def power_iteration(apply_H: Callable, shape, *, tol: float = 1e-10,
                    max_iter: int = 5000, dtype=jnp.float64):
    """Dominant eigenvalue of a nonnegative linear operator.

    ``apply_H`` maps an array of ``shape`` to the same shape.  Returns
    (eigenvalue, iterations).  Sup-norm normalization keeps the iterate
    O(1); the Rayleigh-style estimate is the normalization factor.
    """
    v0 = jnp.ones(shape, dtype=dtype)

    def cond(state):
        _, lam, lam_prev, it = state
        return (jnp.abs(lam - lam_prev) > tol * jnp.abs(lam)) & (it < max_iter)

    def body(state):
        v, lam, _, it = state
        w = apply_H(v)
        lam_new = jnp.max(jnp.abs(w))
        return w / lam_new, lam_new, lam, it + 1

    one = jnp.asarray(1.0, dtype)
    _, lam, _, it = lax.while_loop(
        cond, body, (v0, one, jnp.asarray(0.0, dtype), 0))
    return lam, it


@dataclasses.dataclass
class ExistenceReport:
    spectral_radius: float
    theta: float
    beta: float
    stability_exponent: float     # beta * r(H)^(1/theta)
    exists_unique: bool
    iterations: int

    def __repr__(self):
        return (f"ExistenceReport(r(H)={self.spectral_radius:.6g}, "
                f"beta*r^(1/theta)={self.stability_exponent:.6f}, "
                f"exists_unique={self.exists_unique})")


def existence_check(model, disc=None, grids=None, *, tol=1e-10,
                    quad_degree: int = 5) -> ExistenceReport:
    """Check beta * r(H)^(1/theta) < 1 for a discretized or continuous
    (factored, pre-interp) SSY/GCY model."""
    from ..models.gcy import GCY
    from ..models.ssy import SSY

    if (disc is None) == (grids is None):
        raise ValueError("pass exactly one of disc or grids")

    if disc is not None:
        if isinstance(model, SSY):
            from ..operators.discrete_ssy import _hw_theta_factored, _ssy_factors
            B_lam, A2, A3 = _ssy_factors(model, disc)
            apply_H = lambda v: _hw_theta_factored(
                v, B_lam, disc.h_c_Q, disc.h_z_Q, disc.z_P, A2, A3)
            shape = disc.shapes
        elif isinstance(model, GCY):
            from ..operators.discrete_gcy import _gcy_factors
            B_lam, A2, A3 = _gcy_factors(model, disc)

            def apply_H(v):
                u = jnp.einsum("lL,ABCDEL->ABCDEl", B_lam, v)
                u = jnp.einsum("dD,ABCDEl->ABCdEl", disc.h_c_Q, u)
                u = jnp.einsum("cC,ABCdEl->ABcdEl", disc.h_z_Q, u)
                u = jnp.einsum("eE,ABcdEl->ABcdel", disc.h_zpi_Q, u)
                u = jnp.einsum("bB,ABcdel->Abcdel", disc.z_pi_P, u)
                u = jnp.einsum("aA,Abcdel->abcdel", disc.z_P, u)
                return (A2[None, None, None, :, None, None]
                        * A3[:, :, :, None, :, None] * u)
            shape = disc.shapes
        else:
            raise TypeError(f"unsupported model {type(model).__name__}")
    else:
        # Continuous: the linear part of the factored pre-interp operator.
        if isinstance(model, SSY):
            from ..operators.continuous_ssy import T_ssy_continuous_factory
            T = T_ssy_continuous_factory(model, grids, interp="pre",
                                         space="w", quad_degree=quad_degree,
                                         jit=False)
        elif isinstance(model, GCY):
            from ..operators.continuous_gcy import T_gcy_continuous_factory
            T = T_gcy_continuous_factory(model, grids, interp="pre",
                                         space="w", quad_degree=quad_degree,
                                         jit=False)
        else:
            raise TypeError(f"unsupported model {type(model).__name__}")
        theta, beta = model.theta, model.beta

        def apply_H(v):
            # T(w) = 1 + beta*(H w^theta)^(1/theta) => H v recoverable by
            # feeding w = v^(1/theta):
            w = v ** (1.0 / theta)
            return (((T(w) - 1.0) / beta)) ** theta
        shape = tuple(len(g) for g in grids)

    lam, it = jax.jit(
        lambda: power_iteration(apply_H, shape, tol=tol))()
    lam = float(lam)
    expo = model.beta * lam ** (1.0 / model.theta)
    return ExistenceReport(spectral_radius=lam, theta=model.theta,
                           beta=model.beta, stability_exponent=expo,
                           exists_unique=bool(expo < 1.0),
                           iterations=int(it))


@dataclasses.dataclass
class StabilityDecomposition:
    """Companion-paper decomposition of the (log) stability exponent."""
    S: float               # ln beta + S_lambda + (1 - 1/psi) * S_c
    ln_beta: float
    S_lambda: float        # (1/theta) ln r(B_lambda)
    S_c: float             # (1/(1-gamma)) ln r(M_c)
    coefficient: float     # 1 - 1/psi
    S_direct: float        # ln(beta) + (1/theta) ln r(H), full chain
    exists_unique: bool    # S < 0

    def __repr__(self):
        return (f"StabilityDecomposition(S={self.S:.8f} = ln_beta "
                f"{self.ln_beta:.6f} + S_lambda {self.S_lambda:.6f} + "
                f"{self.coefficient:.4f}*S_c ({self.S_c:.6f}); "
                f"direct {self.S_direct:.8f}; "
                f"exists_unique={self.exists_unique})")


def stability_decomposition(model, disc, *, tol: float = 1e-12
                            ) -> StabilityDecomposition:
    """Decompose the stability exponent S = ln(beta * r(H)^(1/theta)) as

        S = ln beta + S_lambda + (1 - 1/psi) * S_c

    (the companion paper's Proposition on stability-coefficient
    decomposition under independence of preference shocks and
    consumption, reference ``paper/temp.tex:820-870``; computation
    recipe ``:2145-2223``).  S_lambda isolates the preference-shock
    channel, S_c the consumption-growth channel.

    On the discretized chain the independence is structural: H is
    exactly the Kronecker product of the lambda-tilted chain B_lambda
    (``_ssy_factors``'s first factor) and the consumption-tilted chain
    M_c (the remaining per-axis factors with the A2/A3 current-state
    tilt), so r(H) = r(B_lambda) * r(M_c) and the decomposition is
    exact — ``S`` and ``S_direct`` agree to power-iteration tolerance,
    which the tests assert.  S_lambda = ln(r(B_lambda))/theta and
    S_c = ln(r(M_c))/(1-gamma), with (1-gamma)/theta = 1 - 1/psi.
    """
    import numpy as np

    from ..models.gcy import GCY
    from ..models.ssy import SSY

    theta, beta, gamma, psi = (model.theta, model.beta, model.gamma,
                               model.psi)
    if isinstance(model, SSY):
        from ..operators.discrete_ssy import _ssy_factors
        B_lam, A2, A3 = _ssy_factors(model, disc)
        Qc, Qhz, zP = disc.h_c_Q, disc.h_z_Q, disc.z_P

        def apply_Mc(v):                      # v: (h_c, h_z, z)
            u = jnp.einsum("km,mij->kij", Qc, v)
            u = jnp.einsum("im,kmj->kij", Qhz, u)
            u = jnp.einsum("jm,kim->kij", zP, u)
            return A2[:, None, None] * A3[None, :, :] * u

        mc_shape = disc.shapes[1:]            # (n_hc, n_hz, n_z)
    elif isinstance(model, GCY):
        from ..operators.discrete_gcy import _gcy_factors
        B_lam, A2, A3 = _gcy_factors(model, disc)

        def apply_Mc(v):                      # v: (z, z_pi, h_z, h_c, h_zpi)
            u = jnp.einsum("dD,ABCDE->ABCdE", disc.h_c_Q, v)
            u = jnp.einsum("cC,ABCdE->ABcdE", disc.h_z_Q, u)
            u = jnp.einsum("eE,ABcdE->ABcde", disc.h_zpi_Q, u)
            u = jnp.einsum("bB,ABcde->Abcde", disc.z_pi_P, u)
            u = jnp.einsum("aA,Abcde->abcde", disc.z_P, u)
            return (A2[None, None, None, :, None]
                    * A3[:, :, :, None, :] * u)

        mc_shape = disc.shapes[:-1]           # all axes but h_lam
    else:
        raise TypeError(f"unsupported model {type(model).__name__}")

    # Preference-shock channel: B_lambda is small (n_lam x n_lam) —
    # dense Perron root on host.
    r_lam = float(np.max(np.abs(np.linalg.eigvals(np.asarray(B_lam)))))
    S_lam = float(np.log(r_lam) / theta)

    r_c, _ = jax.jit(lambda: power_iteration(apply_Mc, mc_shape, tol=tol))()
    S_c = float(jnp.log(r_c) / (1.0 - gamma))

    coeff = 1.0 - 1.0 / psi
    S = float(np.log(beta)) + S_lam + coeff * S_c

    rep = existence_check(model, disc, tol=tol)
    S_direct = float(np.log(rep.stability_exponent))

    return StabilityDecomposition(
        S=S, ln_beta=float(np.log(beta)), S_lambda=S_lam, S_c=S_c,
        coefficient=coeff, S_direct=S_direct, exists_unique=bool(S < 0))


def stability_exponent_mc(model, *, T: int = 100_000, N: int = 10_000,
                          seed: int = 0, dtype=jnp.float64):
    """Monte Carlo estimate of the stability exponent S — the companion
    paper's path-simulation estimator (reference ``paper/temp.tex:
    2224-2270``, which uses T = 100,000 and N = 10,000), with the
    consumption shock integrated out analytically per its computation
    recipe (``:2195-2216``).

    Estimates both channels from N simulated state paths of length T
    (one device-resident ``lax.scan``):

        S_lambda_hat = (1/(T theta))   ln (1/N) sum_n exp(theta * sum_t h_lam)
        S_c_hat      = mu_c + (1/(T(1-gamma))) ln (1/N) sum_n
                       exp((1-gamma) sum_t z + (1-gamma)^2/2 sum_t sigma_c^2)

    and returns ``dict(S, S_lambda, S_c, T, N)`` with
    S = ln beta + S_lambda + (1 - 1/psi) S_c.  This is the *continuous*
    dynamics' exponent: it cross-checks :func:`stability_decomposition`
    up to discretization + O(1/T) + Monte Carlo error.

    CAVEAT (why the spectral route is the production check): a naive
    sample average of exp(a * sum_t X_t) is consistent only if N grows
    exponentially with Var(a * sum X) — when the tilted sum's standard
    deviation is >> 1 the expectation lives in the unsampled tail and
    the estimator biases toward zero exponent *no matter how large T
    is*.  At the headline SSY calibration theta*sum h_lam has std ~ 22
    at T = 20,000, so this estimator (and the paper's, which is the
    same construction) understates |S_lambda| by ~3x there; the paper's
    own footnote about needing "much longer sample paths ... in the
    presence of preference shocks" is this effect.  The spectral
    decomposition has no sampling step and agrees with the analytic
    Gaussian long-run formula (theta/2) s_lam^2/(1-rho_lam)^2 to 3e-9
    (tests).  Use the MC route only when the tilted-sum std is moderate
    (tests validate it to ~5e-7 on such a calibration).
    """
    from jax.scipy.special import logsumexp

    from ..models.ssy import SSY as _SSY

    if isinstance(model, _SSY):
        from ..operators.continuous_ssy import next_state_ssy as _step
        dim, iz = 4, 3
    else:
        from ..operators.continuous_gcy import next_state_gcy as _step
        dim, iz = 6, 4
    theta, gamma, psi, beta = (model.theta, model.gamma, model.psi,
                               model.beta)

    def body(carry, key_t):
        x, s_lam, s_z, s_sig2 = carry
        # z and sigma_c^2 enter as time-(t-1) states (temp.tex:2166-2216).
        s_z = s_z + x[iz]
        s_sig2 = s_sig2 + (model.phi_c * jnp.exp(x[1])) ** 2
        eps = jax.random.normal(key_t, (dim, x.shape[1]), dtype)
        x_new = _step(model, x, eps)
        s_lam = s_lam + x_new[0]                  # h_lam at time t
        return (x_new, s_lam, s_z, s_sig2), None

    @jax.jit
    def run(key):
        x0 = jnp.zeros((dim, N), dtype)
        z0 = jnp.zeros((N,), dtype)
        keys = jax.random.split(key, T)
        (x, s_lam, s_z, s_sig2), _ = lax.scan(
            body, (x0, z0, z0, z0), keys)
        logN = jnp.log(jnp.asarray(float(N), dtype))
        S_lam = (logsumexp(theta * s_lam) - logN) / (T * theta)
        S_c = model.mu_c + (
            logsumexp((1 - gamma) * s_z
                      + 0.5 * (1 - gamma) ** 2 * s_sig2) - logN
        ) / (T * (1 - gamma))
        return S_lam, S_c

    S_lam, S_c = run(jax.random.PRNGKey(seed))
    S_lam, S_c = float(S_lam), float(S_c)
    import numpy as np
    S = float(np.log(beta)) + S_lam + (1 - 1 / psi) * S_c
    return dict(S=S, S_lambda=S_lam, S_c=S_c, T=T, N=N)


def stability_exponent_transient(*, beta: float, gamma: float, psi: float,
                                 mu_c: float, sigma_c: float,
                                 s_lam: float, rho_lam: float
                                 ) -> StabilityDecomposition:
    """Closed-form stability exponent for the purely-transient benchmark
    (companion paper Proposition p:ar1, ``temp.tex:967-1010``):
    ``g_c = mu_c + sigma_c xi`` IID, preference shocks AR(1).

        S_lambda = theta s_lam^2 / (2 (1 - rho_lam)^2)
        S_c      = mu_c + (1 - gamma) sigma_c^2 / 2
        S        = ln beta + S_lambda + (1 - 1/psi) S_c

    Every term is analytic — this is the fixed point the chain-spectral
    machinery converges to as the discretization refines (exactly, for
    S_c, on any chain with the transient states frozen: the tilted
    factor is scalar).
    """
    import math

    theta = (1.0 - gamma) / (1.0 - 1.0 / psi)
    S_lam = theta * s_lam**2 / (2.0 * (1.0 - rho_lam)**2)
    S_c = mu_c + 0.5 * (1.0 - gamma) * sigma_c**2
    coeff = 1.0 - 1.0 / psi
    S = math.log(beta) + S_lam + coeff * S_c
    return StabilityDecomposition(S=S, ln_beta=math.log(beta),
                                  S_lambda=S_lam, S_c=S_c,
                                  coefficient=coeff, S_direct=S,
                                  exists_unique=bool(S < 0.0))


def stability_exponent_constant_vol(*, beta: float, gamma: float,
                                    psi: float, mu_c: float,
                                    sigma_c: float, sigma: float,
                                    rho: float, s_lam: float,
                                    rho_lam: float
                                    ) -> StabilityDecomposition:
    """Closed-form stability exponent for the constant-volatility
    long-run-risk benchmark (companion paper ``temp.tex:1101-1138``,
    Bansal–Yaron §I.A dynamics): ``g_c = mu_c + z + sigma_c xi`` with
    ``z' = rho z + sigma eta``.  Relative to the purely-transient case
    the consumption channel gains the long-run term
    ``sigma^2 / (1 - rho)^2``:

        S_c = mu_c + (1 - gamma)(sigma_c^2 + sigma^2/(1-rho)^2) / 2.
    """
    import math

    theta = (1.0 - gamma) / (1.0 - 1.0 / psi)
    S_lam = theta * s_lam**2 / (2.0 * (1.0 - rho_lam)**2)
    S_c = mu_c + 0.5 * (1.0 - gamma) * (sigma_c**2
                                        + sigma**2 / (1.0 - rho)**2)
    coeff = 1.0 - 1.0 / psi
    S = math.log(beta) + S_lam + coeff * S_c
    return StabilityDecomposition(S=S, ln_beta=math.log(beta),
                                  S_lambda=S_lam, S_c=S_c,
                                  coefficient=coeff, S_direct=S,
                                  exists_unique=bool(S < 0.0))
