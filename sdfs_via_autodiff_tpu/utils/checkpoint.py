"""Versioned checkpointing for solved models.

The reference writes raw consecutive ``np.save`` records (grids, w_star) to
one file (reference ``ssy_wc_ratio_continuous.py:291-295``) and reloads them
positionally (:304-326).  Here a checkpoint is a single compressed ``.npz``
with named, versioned entries carrying everything needed to reconstruct the
solution callable and to warm-resume a solve: the grids, the solved w, the
model parameters, and solver metadata.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

CHECKPOINT_VERSION = 1

__all__ = ["save_solution", "load_solution", "SolutionCheckpoint"]


@dataclasses.dataclass
class SolutionCheckpoint:
    version: int
    model_name: str
    model_params: dict
    grids: Tuple[np.ndarray, ...]
    w_star: np.ndarray
    meta: dict

    def grids_jnp(self):
        return tuple(jnp.asarray(g) for g in self.grids)


def save_solution(path: str,
                  model,
                  grids: Sequence,
                  w_star,
                  meta: Optional[dict] = None) -> None:
    """Write a solution checkpoint.

    ``model`` is an SSY/GCY dataclass (its fields are stored as JSON);
    ``meta`` can carry solver settings, residuals, iteration counts.
    """
    payload = {
        "version": np.int64(CHECKPOINT_VERSION),
        "model_name": np.str_(type(model).__name__),
        "model_params": np.str_(json.dumps(dataclasses.asdict(model))),
        "n_grids": np.int64(len(grids)),
        "w_star": np.asarray(w_star),
        "meta": np.str_(json.dumps(meta or {})),
    }
    for i, g in enumerate(grids):
        payload[f"grid_{i}"] = np.asarray(g)
    np.savez_compressed(path, **payload)


def load_solution(path: str) -> SolutionCheckpoint:
    with np.load(path, allow_pickle=False) as data:
        version = int(data["version"])
        if version > CHECKPOINT_VERSION:
            raise ValueError(
                f"checkpoint version {version} is newer than supported "
                f"{CHECKPOINT_VERSION}")
        n = int(data["n_grids"])
        return SolutionCheckpoint(
            version=version,
            model_name=str(data["model_name"]),
            model_params=json.loads(str(data["model_params"])),
            grids=tuple(data[f"grid_{i}"] for i in range(n)),
            w_star=data["w_star"],
            meta=json.loads(str(data["meta"])),
        )
