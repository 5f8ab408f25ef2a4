"""Scale demo: 10^7-point solves through the tiled Pallas kernels.

Reproduces the NORTHSTAR.json configurations interactively (TPU backend):

* continuous SSY at (56, 56, 56, 64) = 11.2M points — sub-second Newton
  steps from the log-linear warm start;
* discrete GCY at 1.0M points (the six-state float32 range envelope)
  through the Kronecker-grouped tiled kernel;
* continuous GCY at 18.9M points through the streamed pair kernel
  (coarse-fit additive baseline).

The reference's largest recorded run is 20^4 = 160k points
(``/root/reference/code/ssy/continuous_junnan/test_newton.md:219``).
Run:  python examples/scale_demo.py [--small]
"""

import sys
import time

import jax
import jax.numpy as jnp


def main(small: bool = False):
    from sdfs_via_autodiff_tpu import GCY, SSY, wc_ratio_continuous, \
        wc_ratio_discrete

    ssy_shape = (24, 24, 24, 32) if small else (56, 56, 56, 64)
    n = 1
    for v in ssy_shape:
        n *= v
    print(f"-- continuous SSY, {ssy_shape} = {n/1e6:.2f}M points, "
          "tiled kernel, Newton, f32 --")
    t0 = time.time()
    sol = wc_ratio_continuous(SSY(), ssy_shape, interp="pre",
                              kernel="tiled", algorithm="newton",
                              baseline="loglinear", tol=2e-5, space="log")
    print(f"  {time.time()-t0:.1f}s: iters={int(sol.result.iterations)} "
          f"residual={float(sol.result.residual):.2e} "
          f"converged={bool(sol.result.converged)}")

    gcy_shape = (4, 4, 8, 8, 8, 8) if small else (6, 6, 12, 12, 12, 16)
    n = 1
    for v in gcy_shape:
        n *= v
    print(f"-- discrete GCY, {gcy_shape} = {n/1e6:.2f}M points, "
          "Kronecker-grouped tiled kernel, Newton, f32 --")
    t0 = time.time()
    # theta = -36 amplifies the f32 floor ~2x vs SSY: 3e-5 clears it at
    # both sizes (the stall guard would stop cleanly either way).
    sol = wc_ratio_discrete(GCY(), gcy_shape, kernel="tiled",
                            algorithm="newton", tol=3e-5, space="log")
    print(f"  {time.time()-t0:.1f}s: iters={int(sol.result.iterations)} "
          f"residual={float(sol.result.residual):.2e} "
          f"converged={bool(sol.result.converged)}")

    # Continuous GCY through the streamed *pair* kernel (round 4): the
    # conditioned z/z_pi expectations contract per-slice in VMEM; n_z
    # must be a multiple of 128.  baseline="coarse" fits ANOVA main
    # effects from a small f64 solve — theta = -36 leaves even the
    # log-linear-normalized residual outside exp's f32 range.
    gcc_shape = (8, 8, 4, 4, 128, 4) if small else (16, 8, 12, 12, 128, 8)
    n = 1
    for v in gcc_shape:
        n *= v
    print(f"-- continuous GCY, {gcc_shape} = {n/1e6:.2f}M points, "
          "streamed pair kernel, Newton, f32 --")
    t0 = time.time()
    sol = wc_ratio_continuous(GCY(), gcc_shape, interp="pre",
                              kernel="tiled", algorithm="newton",
                              baseline="coarse", tol=3e-5, space="log",
                              inner_maxiter=12)
    print(f"  {time.time()-t0:.1f}s: iters={int(sol.result.iterations)} "
          f"residual={float(sol.result.residual):.2e} "
          f"converged={bool(sol.result.converged)}")


if __name__ == "__main__":
    main(small="--small" in sys.argv[1:])
