"""Solver result structure.

The reference solvers return ``(x_star, num_iter)`` and drop the iteration
count at the front-end (reference ``code/solvers.py:175-177``).  Here every
solver returns a :class:`SolveResult` carrying the solution, iteration count,
final residual, and a convergence flag — the structured per-iteration record
the reference's ``print``-based logging approximates
(``code/solvers.py:28-46``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SolveResult:
    """Outcome of a fixed-point solve.

    Attributes
    ----------
    x:          the final iterate (same pytree/array structure as the guess)
    iterations: number of operator applications of the *outer* loop
    residual:   final sup-norm error max|x_new - x|
    converged:  residual <= tol and no NaN/divergence guard tripped
    error_trace: optional per-iteration residual history (fixed-length
        buffer padded with NaN), when tracing was requested
    """

    x: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray
    converged: jnp.ndarray
    error_trace: Optional[jnp.ndarray] = None

    def __repr__(self) -> str:  # concise host-side summary
        try:
            return (f"SolveResult(iterations={int(self.iterations)}, "
                    f"residual={float(self.residual):.3e}, "
                    f"converged={bool(self.converged)})")
        except Exception:
            return object.__repr__(self)
