"""End-to-end SSY continuous-state demo.

Script equivalent of the reference's ``ssy_test_continuous.md`` notebook
(reference ``code/ssy/continuous_junnan/ssy_test_continuous.md``): solve
the wealth-consumption ratio on a 15x15x15x20 grid with quadrature and
Monte Carlo expectations, across solvers, compare with the log-linear
approximation, and report simulated moments.

Run: python examples/ssy_continuous_demo.py
"""

import time

import numpy as np

from sdfs_via_autodiff_tpu import (
    SSY, construct_wstar_callable, one_step_w_moments, simulated_w_moments,
    ssy_loglinear_factory, wc_ratio_continuous)

SIZES = (15, 15, 15, 20)


def main():
    model = SSY()
    print(f"SSY: beta={model.beta}, gamma={model.gamma}, psi={model.psi}, "
          f"theta={model.theta:.3f}")

    for algorithm in ("newton", "anderson", "successive_approx"):
        t0 = time.time()
        sol = wc_ratio_continuous(model, SIZES, algorithm=algorithm,
                                  tol=1e-8, interp="pre")
        print(f"{algorithm:>18}: iters={int(sol.result.iterations):>6} "
              f"residual={float(sol.result.residual):.2e} "
              f"wall={time.time()-t0:.2f}s "
              f"w* center={float(sol.w_star[7, 7, 7, 10]):.2f}")

    # Monte Carlo expectations (reference Kg_vmap_mc path).
    t0 = time.time()
    sol_mc = wc_ratio_continuous(model, (8, 8, 8, 10), algorithm="newton",
                                 tol=1e-6, method="monte_carlo",
                                 interp="post", mc_draw_size=1000)
    print(f"{'monte_carlo/post':>18}: iters={int(sol_mc.result.iterations)} "
          f"wall={time.time()-t0:.2f}s")

    # Log-linear overlay (reference ssy_test_continuous.md:200-225).
    sol = wc_ratio_continuous(model, SIZES, algorithm="newton", tol=1e-8,
                              interp="pre")
    ll = ssy_loglinear_factory(model)
    center_ll = float(np.exp(ll(np.zeros(4))))
    center_num = float(sol.w_star[7, 7, 7, 10])
    print(f"log-linear w at center: {center_ll:.2f} vs solved {center_num:.2f}")

    # One-step moments: the reference's tabulated anchors
    # (test_newton.md:198-215) evaluate w* on 10^6 one-step draws from the
    # origin.  Reference at this exact config (15^4, std=3.2, d=5,
    # w^theta-interp): E[w]=670.75, sigma[w]=6.60.
    f = construct_wstar_callable(sol.w_star, sol.grids)
    mean, std = one_step_w_moments(model, f, num_draws=1_000_000)
    print(f"one-step E[w]={mean:.2f}, sigma[w]={std:.2f} "
          f"(reference anchor: 670.75, 6.60)")

    # Long-path moments (this framework's addition: ergodic moments).
    mean_p, std_p = simulated_w_moments(model, f, num_steps=1_000_000)
    print(f"ergodic-path E[w]={mean_p:.2f}, sigma[w]={std_p:.2f}")


if __name__ == "__main__":
    main()
