"""Gradient-based fixed-point solver (residual-norm minimization).

Reference parity: ``fixed_point_via_gradient_decent`` minimizes
``||f(x) - x||^2`` with ``jaxopt.GradientDescent`` using a line search
(reference ``code/solvers.py:127-140``; registered but noted as weaker than
Newton/Anderson).  Here the same loss is minimized with optax's L-BFGS
(line-search based), entirely on device.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ._cache import cached_build
from .result import SolveResult

__all__ = ["gradient_solver"]


def gradient_solver(T: Callable,
                    x0,
                    tol: float = 1e-4,
                    max_iter: int = 1000,
                    *,
                    jit: bool = True) -> SolveResult:
    """Minimize the squared residual ||T(x) - x||^2 via L-BFGS.

    ``tol``/``max_iter`` defaults follow the reference configuration
    (``code/solvers.py:134-136``).  Convergence is declared on the sup-norm
    of the fixed-point residual, consistent with the other solvers.
    """

    def loss(x):
        r = T(x) - x
        return jnp.vdot(r, r).real

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss)

    def run(x_init, tol, max_iter):
        state0 = opt.init(x_init)
        big = jnp.asarray(jnp.inf, jnp.result_type(x_init))

        def cond(carry):
            _, _, err, it = carry
            return (err > tol) & (it < max_iter) & ~jnp.isnan(err)

        def body(carry):
            x, state, _, it = carry
            value, grad = value_and_grad(x, state=state)
            updates, state = opt.update(grad, state, x, value=value,
                                        grad=grad, value_fn=loss)
            x = optax.apply_updates(x, updates)
            err = jnp.max(jnp.abs(T(x) - x))
            return x, state, err, it + 1

        x, _, err, it = lax.while_loop(cond, body, (x_init, state0, big, 0))
        converged = (err <= tol) & ~jnp.isnan(err)
        return SolveResult(x=x, iterations=it, residual=err,
                           converged=converged)

    if not jit:
        return run(x0, tol, max_iter)
    fn = cached_build(T, ("gd", x0.shape), lambda: jax.jit(run))
    return fn(x0, jnp.asarray(tol, jnp.result_type(x0)),
              jnp.asarray(max_iter, jnp.int64))
