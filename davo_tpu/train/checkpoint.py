"""Checkpoint save/restore (params + optimiser state + RNG).

The reference relies on Lightning's implicit checkpointing
(``camera_calibration_from_oracle_matches.py:70-75`` — no custom
checkpoint code anywhere); here checkpointing is explicit and restore is
mesh-shape-agnostic.

Default format is **Orbax** (``StandardCheckpointer``): tensor-store
backed, schema-evolvable, and able to restore directly onto a device
mesh when given an abstract state whose leaves carry shardings
(``restore_checkpoint(..., abstract_state=...)``).  Plain-pickle
checkpoints (the round-1 format) remain readable and writable
(``format="pickle"``) for the shipped artifact checkpoints.
"""

from __future__ import annotations

import os
import pickle
import warnings
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]

_PREFIX = "checkpoint_"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(
    directory: str, step: int, state: Any, *, format: str = "orbax"
) -> str:
    """Save a pytree checkpoint; returns the checkpoint path.

    :param format: ``"orbax"`` (default; a ``checkpoint_{step}/``
        directory) or ``"pickle"`` (the legacy single-file format).
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    if format == "orbax":
        path = os.path.join(directory, f"{_PREFIX}{step}")
        ckptr = _orbax_checkpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        return path
    if format == "pickle":
        path = os.path.join(directory, f"{_PREFIX}{step}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(_to_host(state), f)
        os.replace(tmp, path)
        return path
    raise ValueError(f"Unknown checkpoint format: {format!r}")


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if not name.startswith(_PREFIX):
            continue
        stem = name[len(_PREFIX) :]
        if stem.endswith(".pkl"):
            stem = stem[: -len(".pkl")]
        elif stem.endswith(".tmp"):
            continue
        try:
            steps.append(int(stem))
        except ValueError:
            continue
    return max(steps) if steps else None


def restore_checkpoint(
    directory: str,
    step: Optional[int] = None,
    *,
    abstract_state: Any = None,
) -> Any:
    """Restore the checkpoint at ``step`` (default: latest).

    Without ``abstract_state``: returns host arrays; the caller re-places
    them onto devices/meshes as needed.  With ``abstract_state`` (a pytree
    of ``jax.ShapeDtypeStruct`` whose leaves carry ``sharding``s — e.g.
    from ``jax.eval_shape`` + ``jax.tree.map`` over the target mesh):
    Orbax restores each leaf directly onto its target sharding, so a
    checkpoint written on one mesh shape restores onto another without a
    host round-trip.  ``abstract_state`` requires the Orbax format.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {directory}")
    directory = os.path.abspath(directory)
    orbax_path = os.path.join(directory, f"{_PREFIX}{step}")
    pickle_path = orbax_path + ".pkl"
    if os.path.isdir(orbax_path):
        ckptr = _orbax_checkpointer()
        if abstract_state is not None:
            return ckptr.restore(orbax_path, abstract_state)
        # Host restore must not depend on the checkpoint's saved shardings:
        # a checkpoint written on TPU would otherwise fail to restore in a
        # CPU process ("Device TPU v5 lite0 was not found"). Restore every
        # leaf as a plain numpy array instead.
        import orbax.checkpoint as ocp

        pt_ckptr = ocp.PyTreeCheckpointer()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", UserWarning)
            try:
                meta = pt_ckptr.metadata(orbax_path)
                tree = getattr(
                    getattr(meta, "item_metadata", meta), "tree", meta
                )
                restore_args = jax.tree_util.tree_map(
                    lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
                )
                restored = pt_ckptr.restore(
                    orbax_path, restore_args=restore_args
                )
            except Exception:
                # fall back to the sharding-faithful restore (works when
                # the saving platform's devices are present)
                restored = ckptr.restore(orbax_path)
        return _to_host(restored)
    if abstract_state is not None:
        raise ValueError(
            "abstract_state (sharded restore) requires an Orbax "
            f"checkpoint; {orbax_path} not found"
        )
    with open(pickle_path, "rb") as f:
        return pickle.load(f)
