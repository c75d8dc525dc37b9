"""Trajectory / scene evaluation metrics.

The reference publishes no benchmark numbers; BASELINE.md's accuracy
target is trajectory error (ATE) on the synthetic oracle-match sequences.
This module provides the standard evaluation tools: Umeyama similarity
alignment (gauge removal — estimated scenes are only determined up to a
similarity transform) and absolute trajectory error statistics.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from davo_tpu.geometry import so3_rotation_matrix
from davo_tpu.utils import full_f32_matmuls

__all__ = [
    "camera_centers_from_poses",
    "umeyama_alignment",
    "absolute_trajectory_error",
    "intrinsics_error",
]


@full_f32_matmuls
def camera_centers_from_poses(
    orientations: jax.Array, translations: jax.Array
) -> jax.Array:
    """Camera centres in world coordinates from world->camera poses
    (``p_cam = R p + t`` => centre ``= -R^T t``).

    :param orientations: ``(..., M, 3)`` axis-angle.
    :param translations: ``(..., M, 3)``.
    """
    rot = so3_rotation_matrix(orientations)
    return -jnp.einsum("...ji,...j->...i", rot, translations)


@full_f32_matmuls
def umeyama_alignment(
    source: jax.Array, target: jax.Array, with_scale: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares similarity transform aligning ``source`` to ``target``
    (Umeyama 1991): returns ``(R, t, s)`` minimising
    ``sum_i | s R source_i + t - target_i |^2``.

    :param source: ``(K, 3)`` points.
    :param target: ``(K, 3)`` points.
    """
    mu_s = jnp.mean(source, axis=0)
    mu_t = jnp.mean(target, axis=0)
    xs = source - mu_s
    xt = target - mu_t
    cov = xt.T @ xs / source.shape[0]
    u, d, vt = jnp.linalg.svd(cov)
    sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    s_diag = jnp.ones(3).at[2].set(sign)
    rot = (u * s_diag) @ vt
    if with_scale:
        var_s = jnp.mean(jnp.sum(jnp.square(xs), axis=-1))
        scale = jnp.sum(d * s_diag) / jnp.maximum(var_s, 1e-12)
    else:
        scale = jnp.ones(())
    t = mu_t - scale * rot @ mu_s
    return rot, t, scale


@full_f32_matmuls
def absolute_trajectory_error(
    estimated_positions: jax.Array,
    true_positions: jax.Array,
    align: bool = True,
    with_scale: bool = True,
) -> Dict[str, jax.Array]:
    """ATE statistics between estimated and ground-truth positions.

    :param estimated_positions: ``(K, 3)``.
    :param true_positions: ``(K, 3)``.
    :param align: align with a similarity transform first (gauge removal).
    :return: dict with ``rmse``, ``mean``, ``median``, ``max`` (scalars).
    """
    est = estimated_positions
    if align:
        rot, t, s = umeyama_alignment(est, true_positions, with_scale)
        est = s * est @ rot.T + t
    err = jnp.linalg.norm(est - true_positions, axis=-1)
    return {
        "rmse": jnp.sqrt(jnp.mean(jnp.square(err))),
        "mean": jnp.mean(err),
        "median": jnp.median(err),
        "max": jnp.max(err),
    }


def intrinsics_error(
    estimated: jax.Array, true: jax.Array
) -> Dict[str, jax.Array]:
    """Per-component absolute intrinsics errors (``f``, ``cx``, ``cy``)."""
    diff = jnp.abs(estimated - true)
    return {
        "f_error": jnp.mean(diff[..., 0]),
        "cx_error": jnp.mean(diff[..., 1]),
        "cy_error": jnp.mean(diff[..., 2]),
    }
