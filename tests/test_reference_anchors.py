"""Quantitative parity with the reference's published anchors.

The only numerical results recorded in the reference repo are the
one-step-simulated moments of w* tabulated in ``test_newton.md:217-238``
(see BASELINE.md).  This framework reproduces them to ~0.01% (residual
difference is PRNG-stream level) via the factored pre-power quadrature
operator + Newton + one-step moments.
"""

import numpy as np
import pytest

from sdfs_via_autodiff_tpu import (
    SSY, construct_wstar_callable, one_step_w_moments, wc_ratio_continuous)


@pytest.mark.parametrize("sizes,std,degree,anchor", [
    ((15, 15, 15, 15), 3.2, 5, (670.75128139, 6.60051464)),
    ((15, 15, 15, 15), 2.5, 5, (983.28449407, 8.76520362)),
])
def test_ssy_one_step_moment_anchors(sizes, std, degree, anchor):
    model = SSY()
    sol = wc_ratio_continuous(model, sizes, algorithm="newton", tol=1e-9,
                              interp="pre", quad_degree=degree,
                              num_std_devs=std)
    assert sol.converged
    f = construct_wstar_callable(sol.w_star, sol.grids)
    mean, stdev = one_step_w_moments(model, f, num_draws=1_000_000)
    # 0.1% band: generous against PRNG-stream and accumulation differences.
    assert abs(mean - anchor[0]) / anchor[0] < 1e-3
    assert abs(stdev - anchor[1]) / anchor[1] < 5e-3
