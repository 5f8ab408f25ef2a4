"""Solution callables: interpolated w*(x) built from arrays or checkpoints.

Parity target: reference ``construct_wstar_callable``
(``ssy_wc_ratio_continuous.py:304-326`` and the GCY twin :342-364) — the
deliverable consumed by downstream SDF computations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.interp import lin_interp
from ..utils.checkpoint import load_solution

__all__ = ["construct_wstar_callable"]


def construct_wstar_callable(w_star_vals=None,
                             grids: Optional[Sequence] = None,
                             datafile: Optional[str] = None):
    """Return a jitted ``x -> w*(x)`` multilinear interpolant.

    Pass ``(w_star_vals, grids)`` directly, or ``datafile`` pointing at a
    checkpoint written by :func:`..utils.checkpoint.save_solution`.
    ``x`` has shape (dim,) or (dim, N).
    """
    if w_star_vals is None or grids is None:
        if datafile is None:
            raise ValueError("provide (w_star_vals, grids) or datafile")
        ckpt = load_solution(datafile)
        grids = ckpt.grids_jnp()
        w_star_vals = jnp.asarray(ckpt.w_star)
    else:
        grids = tuple(jnp.asarray(g) for g in grids)
        w_star_vals = jnp.asarray(w_star_vals)

    @jax.jit
    def w_star_func(x):
        x = jnp.asarray(x)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        out = lin_interp(x, w_star_vals, grids)
        return out[0] if squeeze else out

    return w_star_func
