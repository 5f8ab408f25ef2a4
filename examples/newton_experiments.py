"""Newton vs Anderson vs plain iteration, and interpolation-space effects.

Script equivalent of the reference's ``test_newton.md`` notebook: solver
cross-checks and the w^theta-interpolation vs log-interpolation comparison
(reference ``code/ssy/continuous_junnan/test_newton.md``).
"""

import numpy as np

from sdfs_via_autodiff_tpu import (
    SSY, construct_wstar_callable, simulated_w_moments, wc_ratio_continuous)

SIZES = (15, 15, 15, 20)


def main():
    model = SSY()

    # Cross-solver agreement (reference test_newton.md:193-195).
    s_newton = wc_ratio_continuous(model, SIZES, algorithm="newton",
                                   tol=1e-9, interp="pre")
    s_aa = wc_ratio_continuous(model, SIZES, algorithm="anderson",
                               tol=1e-9, interp="pre")
    diff = float(np.max(np.abs(np.asarray(s_newton.w_star)
                               - np.asarray(s_aa.w_star))))
    print(f"newton vs anderson sup diff: {diff:.2e}")

    # Interpolation-space comparison (test_newton.md:217-238): the
    # functional form materially shifts the level at beta ~ 1.
    for interp, label in (("pre", "w^theta-interp (factored)"),
                          ("post", "w-interp-then-power (reference)"),
                          ("loglin", "log-interp")):
        sol = wc_ratio_continuous(model, (8, 8, 8, 10), algorithm="newton",
                                  tol=1e-8, interp=interp)
        f = construct_wstar_callable(sol.w_star, sol.grids)
        mean, std = simulated_w_moments(model, f, num_steps=200_000)
        print(f"{label:>34}: E[w]={mean:8.2f}  sigma[w]={std:6.2f}")


if __name__ == "__main__":
    main()
