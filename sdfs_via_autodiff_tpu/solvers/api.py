"""Solver registry and front-end.

One entry point, :func:`solve`, returning a structured :class:`SolveResult`
(the reference front-end drops the iteration count, ``code/solvers.py:
154-177``).  A thin :func:`solver` compatibility shim reproduces the
reference call signature, including the fall-back-to-successive-approximation
behaviour on an unknown algorithm name.
"""

from __future__ import annotations

import warnings
from typing import Callable

from .anderson import anderson_solver
from .fixed_point import newton_solver, successive_approx
from .gradient import gradient_solver
from .result import SolveResult

__all__ = ["SOLVERS", "solve", "solver"]

SOLVERS = {
    "successive_approx": successive_approx,
    "sa": successive_approx,               # short alias
    "newton": newton_solver,
    "anderson": anderson_solver,
    "gd": gradient_solver,
}


def solve(T: Callable, x0, *, method: str = "newton", **kwargs) -> SolveResult:
    """Solve for a fixed point of ``T`` starting from ``x0``.

    ``method`` is one of ``SOLVERS``; extra keyword arguments are forwarded
    to the chosen solver (e.g. ``tol``, ``max_iter``, ``inner``,
    ``history_size``).
    """
    try:
        fn = SOLVERS[method]
    except KeyError:
        raise ValueError(
            f"unknown method {method!r}; available: {sorted(SOLVERS)}"
        ) from None
    return fn(T, x0, **kwargs)


def solver(f: Callable, x_init, algorithm: str = "newton",
           verbose: bool = True):
    """Reference-compatible front end (``code/solvers.py:154-177``): returns
    only the fixed point, falling back to successive approximation with a
    warning when the algorithm name is unknown."""
    if algorithm not in SOLVERS:
        warnings.warn(
            f"Algorithm {algorithm} not found. "
            "Falling back to successive approximation.", stacklevel=2)
        algorithm = "successive_approx"
    res = SOLVERS[algorithm](f, x_init, verbose=verbose) \
        if algorithm != "gd" else SOLVERS[algorithm](f, x_init)
    return res.x
