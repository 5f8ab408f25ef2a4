"""GCY model demo: discrete and continuous solves plus simulation.

Script equivalent of the reference's GCY drivers
(``code/gcy/discrete/gcy_wc_ratio.py:319-340``,
``code/gcy/continuous/gcy_wc_ratio_continuous.py:264-335``).
"""

import time

from sdfs_via_autodiff_tpu import (
    GCY, construct_wstar_callable, simulated_w_moments, wc_ratio_continuous,
    wc_ratio_discrete)


def main():
    model = GCY()
    print(f"GCY: beta={model.beta}, gamma={model.gamma}, psi={model.psi}, "
          f"theta={model.theta:.3f}")

    t0 = time.time()
    sol = wc_ratio_discrete(model, (5, 5, 5, 5, 5, 5), algorithm="newton",
                            tol=1e-9)
    print(f"discrete 5^6 newton: iters={int(sol.result.iterations)} "
          f"residual={float(sol.result.residual):.2e} "
          f"wall={time.time()-t0:.2f}s "
          f"w in [{float(sol.w_star.min()):.1f}, {float(sol.w_star.max()):.1f}]")

    t0 = time.time()
    solc = wc_ratio_continuous(model, (6, 6, 6, 6, 8, 6), algorithm="newton",
                               tol=1e-8, interp="pre", quad_degree=4)
    print(f"continuous 6^4x8x6 newton: iters={int(solc.result.iterations)} "
          f"wall={time.time()-t0:.2f}s")

    f = construct_wstar_callable(solc.w_star, solc.grids)
    mean, std = simulated_w_moments(model, f, num_steps=200_000)
    print(f"simulated E[w]={mean:.2f}, sigma[w]={std:.2f}")


if __name__ == "__main__":
    main()
