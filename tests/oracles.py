"""Slow, obviously-correct NumPy oracles for the discrete Koopmans operators.

Written directly from the operator definition (SURVEY.md §0, paper eq.
T(w) = 1 + beta*(H w^theta)^(1/theta) with the product transition kernel):
nested loops over every (current, next) multi-index pair.  Mirrors the
reference's testing convention of loop twins for vectorized operators
(reference ``code/ssy/discrete/ssy_wc_ratio.py:159-199`` and
``code/gcy/discrete/gcy_wc_ratio.py:244-302``) but implemented fresh here.
Use tiny shapes only.
"""

import itertools

import numpy as np


def T_ssy_oracle(w, model, disc):
    """Loop evaluation of the SSY discrete operator.

    State indices (l, k, i, j) = (h_lam, h_c, h_z, z); next-state indices
    primed.  z_Q is taken from the full (state-dependent) family.
    """
    n_l, n_k, n_i, n_j = disc.shapes
    theta, gamma = model.theta, model.gamma
    beta, mu_c = model.beta, model.mu_c

    h_lam = np.asarray(disc.h_lam_states)
    Ql = np.asarray(disc.h_lam_Q)
    Qk = np.asarray(disc.h_c_Q)
    Qi = np.asarray(disc.h_z_Q)
    zQ = np.asarray(disc.z_Q)          # (i, j, j')
    z_states = np.asarray(disc.z_states)
    sig_c = np.asarray(disc.sigma_c_states)

    out = np.empty((n_l, n_k, n_i, n_j))
    w = np.asarray(w)
    for l, k, i, j in itertools.product(range(n_l), range(n_k),
                                        range(n_i), range(n_j)):
        kappa = np.exp((1 - gamma) * (mu_c + z_states[i, j])
                       + 0.5 * ((1 - gamma) * sig_c[k]) ** 2)
        acc = 0.0
        for lp, kp, ip, jp in itertools.product(range(n_l), range(n_k),
                                                range(n_i), range(n_j)):
            prob = Ql[l, lp] * Qk[k, kp] * Qi[i, ip] * zQ[i, j, jp]
            acc += prob * np.exp(theta * h_lam[lp]) * w[lp, kp, ip, jp] ** theta
        out[l, k, i, j] = 1 + beta * (kappa * acc) ** (1 / theta)
    return out


def T_gcy_oracle(w, model, disc):
    """Loop evaluation of the GCY discrete operator.

    w axis order (a, b, c, d, e, f) = (z, z_pi, h_z, h_c, h_zpi, h_lam).
    """
    n_a, n_b, n_c, n_d, n_e, n_f = disc.shapes
    theta, gamma = model.theta, model.gamma
    beta, mu_c = model.beta, model.mu_c

    h_lam = np.asarray(disc.h_lam_states)
    Qc_ = np.asarray(disc.h_c_Q)
    Qhz = np.asarray(disc.h_z_Q)
    Qhzpi = np.asarray(disc.h_zpi_Q)
    Qlam = np.asarray(disc.h_lam_Q)
    zpiQ = np.asarray(disc.z_pi_Q)       # (e, b, b')
    zQ = np.asarray(disc.z_Q)            # (b, c, e, a, a')
    z_states = np.asarray(disc.z_states)  # (b, c, e, a)
    sig_c = np.asarray(disc.sigma_c_states)

    out = np.empty(disc.shapes)
    w = np.asarray(w)
    cur = itertools.product(range(n_a), range(n_b), range(n_c),
                            range(n_d), range(n_e), range(n_f))
    for a, b, c, d, e, f in cur:
        z = z_states[b, c, e, a]
        kappa = np.exp((1 - gamma) * (mu_c + z)
                       + 0.5 * ((1 - gamma) * sig_c[d]) ** 2)
        acc = 0.0
        nxt = itertools.product(range(n_a), range(n_b), range(n_c),
                                range(n_d), range(n_e), range(n_f))
        for ap, bp, cp, dp, ep, fp in nxt:
            prob = (zQ[b, c, e, a, ap] * zpiQ[e, b, bp] * Qhz[c, cp]
                    * Qc_[d, dp] * Qhzpi[e, ep] * Qlam[f, fp])
            acc += prob * np.exp(theta * h_lam[fp]) * w[ap, bp, cp, dp, ep, fp] ** theta
        out[a, b, c, d, e, f] = 1 + beta * (kappa * acc) ** (1 / theta)
    return out
