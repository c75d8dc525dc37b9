"""Mask-algebra helpers for lockstep batched optimisation.

On TPU every batch element runs full-width; ``where``-style merges replace
the reference's fancy-indexing / ``masked_scatter`` pattern.  Feature parity
target: ``utils/masked_merge.py`` in the reference repo.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["broadcast_mask", "masked_update", "masked_update_tree", "masked_merge_tensors"]


def broadcast_mask(mask: jax.Array, target_ndim: int) -> jax.Array:
    """Append singleton dims to ``mask`` until it has ``target_ndim`` dims."""
    while mask.ndim < target_ndim:
        mask = mask[..., None]
    return mask


def masked_update(current: jax.Array, new: jax.Array, mask: jax.Array) -> jax.Array:
    """``new`` where ``mask`` else ``current``; mask broadcasts over trailing dims."""
    return jnp.where(broadcast_mask(mask, current.ndim), new, current)


def masked_update_tree(current, new, mask: jax.Array):
    """Apply :func:`masked_update` leaf-wise over matching pytrees."""
    return jax.tree_util.tree_map(
        lambda c, n: masked_update(c, n, mask), current, new
    )


def masked_merge_tensors(
    values_1: Optional[jax.Array],
    mask_1: Optional[jax.Array],
    values_2: Optional[jax.Array],
    mask_2: Optional[jax.Array],
    update_mask: jax.Array,
) -> Tuple[Optional[jax.Array], Optional[jax.Array]]:
    """Merge two optional cached tensors with optional validity masks.

    Selects ``values_2`` where ``update_mask`` is True, ``values_1`` where it
    is False, and returns the merged values plus a validity mask (``None`` if
    every merged entry is valid).  All nine None/None combinations of the
    reference (``utils/masked_merge.py:26-60``) are handled.
    """
    if values_1 is None and values_2 is None:
        return None, None
    if values_1 is not None and values_2 is not None:
        merged = masked_update(values_1, values_2, update_mask)
        if mask_1 is None and mask_2 is None:
            return merged, None
        if mask_1 is not None and mask_2 is not None:
            return merged, jnp.where(update_mask, mask_2, mask_1)
        if mask_1 is not None:
            # Everything taken from 2 is valid; entries from 1 need mask_1.
            return merged, jnp.logical_or(mask_1, update_mask)
        # Everything taken from 1 is valid; entries from 2 need mask_2.
        return merged, jnp.logical_or(mask_2, jnp.logical_not(update_mask))
    if values_1 is not None:
        if mask_1 is not None:
            return values_1, jnp.logical_and(mask_1, jnp.logical_not(update_mask))
        return values_1, jnp.logical_not(update_mask)
    if mask_2 is not None:
        return values_2, jnp.logical_and(mask_2, update_mask)
    return values_2, update_mask
