"""Calibration-gradient demo: differentiate the solved W/C ratio in the
model parameters through the fixed point.

``wc_ratio_differentiable`` wraps the solve in the implicit function
theorem (docs/math.md §8): the gradient of any scalar functional of w*
costs one solve plus one adjoint Krylov solve, no matter how many
iterations the solver ran.  The reference cannot do this at all — its
solvers return the bare fixed point and iterate in host-side ``while``
loops (``/root/reference/code/solvers.py:19-48``).

The demo calibrates a moment: find the beta/gamma direction that moves
the model's mean log W/C ratio toward a target, checks the gradient
against a finite-difference re-solve, and prices a one-parameter
sensitivity with the cheap forward-mode path.

Run:  python examples/calibration_gradient.py
"""

import time

import jax
import jax.numpy as jnp


def main():
    from sdfs_via_autodiff_tpu import SSY, wc_ratio_differentiable

    model = SSY()
    sizes = (10, 10, 10, 12)
    wc_fn, p0 = wc_ratio_differentiable(
        model, sizes, fields=("beta", "gamma", "psi"), quad_degree=5,
        tol=1e-10)

    target = 6.6                      # target mean log W/C ratio
    loss = lambda p: (jnp.mean(jnp.log(wc_fn(p))) - target) ** 2

    t0 = time.time()
    val, grad = jax.value_and_grad(loss)(p0)
    dt = time.time() - t0
    print(f"loss {float(val):.6f}; gradient in {dt:.1f}s "
          "(one solve + one adjoint Krylov solve):")
    for k, v in grad.items():
        print(f"  dL/d{k:<6} = {float(v):+.4f}")

    # Finite-difference check on beta (two full re-solves).
    eps = 1e-7
    pp = dict(p0); pm = dict(p0)
    pp["beta"] = p0["beta"] + eps
    pm["beta"] = p0["beta"] - eps
    fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
    rel = abs(fd - float(grad["beta"])) / max(abs(fd), 1e-30)
    print(f"FD check on beta: implicit {float(grad['beta']):+.4f} "
          f"vs FD {fd:+.4f}  (rel diff {rel:.1e})")

    # Forward-mode: mean-log-w sensitivity to gamma alone.
    from sdfs_via_autodiff_tpu.solvers import implicit_sensitivity
    import dataclasses as dc
    from sdfs_via_autodiff_tpu.operators.continuous_ssy import (
        _factored_T, build_grid_ssy)

    grids = build_grid_ssy(model, *sizes, num_std_devs=3.2,
                           dtype=jnp.float64)

    def T_of_p(p, x):
        return _factored_T(dc.replace(model, gamma=p["gamma"]), grids, 5,
                           "log", jnp.float64, None)(x)

    ell_star = jnp.log(wc_fn(p0))
    dx = implicit_sensitivity(T_of_p, {"gamma": p0["gamma"]},
                              {"gamma": jnp.asarray(1.0)}, ell_star)
    print(f"d mean(log w)/d gamma = {float(jnp.mean(dx)):+.4f} "
          "(forward-mode, one sensitivity solve)")

    # Moment matching: perturb (beta, gamma), then recover them from the
    # one-step simulated moments by Gauss-Newton on the IFT gradients.
    import dataclasses
    from sdfs_via_autodiff_tpu import (calibrate_moments,
                                       one_step_moments_differentiable)

    draws = jax.random.normal(jax.random.PRNGKey(1234), (4, 20000),
                              dtype=jnp.float64)
    mu, sd = one_step_moments_differentiable(model, grids, wc_fn(p0), draws)
    start = dataclasses.replace(model, beta=0.9985, gamma=9.5)
    t0 = time.time()
    cal, info = calibrate_moments(
        start, sizes, {"mean": float(mu), "std": float(sd)},
        fields=("beta", "gamma"), quad_degree=5, tol=1e-10,
        num_draws=20000)
    print(f"moment matching: beta {start.beta} -> {cal.beta:.6f} "
          f"(truth {model.beta}), gamma {start.gamma} -> {cal.gamma:.4f} "
          f"(truth {model.gamma}) in {info['steps']} Gauss-Newton steps, "
          f"{time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
