"""SDF pricing demo: solve w*, build the SDF, price the risk-free asset.

The step the reference's pipeline exists for (its paper's results
sections are TODO): from the wealth-consumption ratio to conditional SDF
expectations and the risk-free rate across states.
"""

import numpy as np

from sdfs_via_autodiff_tpu import (
    SSY, construct_wstar_callable, risk_free_rate_ssy, wc_ratio_continuous)


def main():
    model = SSY()
    sol = wc_ratio_continuous(model, (15, 15, 15, 20), algorithm="newton",
                              tol=1e-9, interp="pre")
    f = construct_wstar_callable(sol.w_star, sol.grids)
    rf = risk_free_rate_ssy(model, f)
    print("monthly risk-free rate across the long-run-growth (z) grid:")
    for j in [0, 5, 10, 15, 19]:
        x = np.array([0.0, 0.0, 0.0, float(sol.grids[3][j])])
        r = float(rf(x))
        print(f"  z = {x[3]:+.5f}: r_f = {r*100:6.3f}% /month "
              f"({(1+r)**12-1:6.1%} /yr)")


if __name__ == "__main__":
    main()
