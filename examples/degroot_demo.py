"""de Groot alternative-specification demo (companion paper
``paper/temp.tex:1421-1516``).

The de Groot (2018) aggregator carries preference shocks as a
state-dependent discount factor ``a_t = h(X_t)`` instead of a
multiplicative tilt, which removes the asymptote in the standard
existence condition.  The demo walks the three facts the paper's
section is about:

1. the existence margins differ structurally — the standard condition
   carries the preference-shock growth rate, the alternative carries
   only ``ln sup h``;
2. at ``h = 1`` with no preference shocks the two specifications agree
   exactly through the closed form ``g* = ((1-beta) w*)^theta``;
3. with shocks on, the h = 1 fixed point scale explodes like
   ``(O(1))^theta`` (GCY: ln g ~ 97..124), which is why the log tier
   and the SA->Newton recipe are the production path
   (``drivers.degroot_fixed_point``, docs/math.md §9).

Run:  python examples/degroot_demo.py
"""

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    from sdfs_via_autodiff_tpu import (GCY, SSY, T_ssy_factory,
                                       degroot_fixed_point, discretize_ssy,
                                       existence_check, solve)
    from sdfs_via_autodiff_tpu.operators.degroot import (
        existence_check_degroot)

    # --- 1. existence margins, standard vs alternative ----------------
    model = SSY()
    shapes = (6, 6, 6, 8)
    disc = discretize_ssy(model, shapes)
    std = existence_check(model, disc)
    alt = existence_check_degroot(model, disc)
    print("standard  : r(H) =", f"{std.spectral_radius:.6f}",
          " exists:", std.exists_unique)
    print("de Groot  : r(K~) =", f"{alt.spectral_radius:.6f}",
          f" S~ = {alt.S_alt:+.6f}", " exists:", alt.exists_unique)
    for h in (1.0, 0.99, 0.9):
        rep = existence_check_degroot(model, disc, h=h)
        print(f"  h = {h:4}:  S~ = {rep.S_alt:+.6f}  "
              f"exists_unique = {rep.exists_unique}")

    # --- 2. exact agreement at h=1, s_lam=0 ---------------------------
    noshock = dataclasses.replace(SSY(), s_lam=0.0)
    d0 = discretize_ssy(noshock, shapes)
    w_star = solve(T_ssy_factory(noshock, d0), jnp.full(shapes, 800.0),
                   method="newton", tol=1e-11).x
    sol = degroot_fixed_point(noshock, shapes, tol=1e-12)
    mapped = noshock.theta * jnp.log((1 - noshock.beta) * w_star)
    err = float(jnp.max(jnp.abs(sol.log_g_star - mapped)))
    print(f"\nclosed-form anchor  sup|ln g* - theta ln((1-b)w*)| = {err:.2e}")

    # --- 3. the theta-power scale, and the log tier -------------------
    gcy = GCY()
    sol_g = degroot_fixed_point(gcy, (3, 3, 3, 3, 4, 3), kind="continuous",
                                quad_degree=3, tol=1e-11)
    lg = np.asarray(sol_g.log_g_star)
    print(f"\nGCY h=1 continuous: converged={sol_g.converged}, "
          f"ln g in [{lg.min():.1f}, {lg.max():.1f}]  "
          f"(g ~ e^{lg.min():.0f}..e^{lg.max():.0f} — log tier only)")


if __name__ == "__main__":
    main()
