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
    "relative_pose_error",
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


@full_f32_matmuls
def relative_pose_error(
    estimated_poses: jax.Array,
    true_poses: jax.Array,
    delta: int = 1,
) -> Dict[str, jax.Array]:
    """RPE over frame pairs ``(i, i + delta)`` (the TUM benchmark metric).

    For each pair, the error motion is
    ``E_i = (Q_i^-1 Q_{i+d})^-1 (P_i^-1 P_{i+d})`` with ``Q`` ground-truth
    and ``P`` estimated camera-to-world transforms; reported are the
    translational RMSE/mean and the rotational angle RMSE/mean (radians).
    Drift-local by construction — no global alignment is applied.

    :param estimated_poses: ``(K, 6)`` world->camera ``[axis-angle, t]``.
    :param true_poses: ``(K, 6)``.
    """
    if delta < 1 or delta >= estimated_poses.shape[0]:
        raise ValueError(
            f"delta must be in [1, K-1] (got {delta}, K="
            f"{estimated_poses.shape[0]})"
        )

    def rel_motion(poses):
        # camera-to-world: R_c2w = R^T, c = -R^T t
        rot = so3_rotation_matrix(poses[:, 0:3])
        c = -jnp.einsum("kji,kj->ki", rot, poses[:, 3:6])
        r_c2w = jnp.transpose(rot, (0, 2, 1))
        # motion i -> i+d in frame i: R_i^T-composed relative transform
        r_rel = jnp.einsum(
            "kji,kjl->kil", r_c2w[:-delta], r_c2w[delta:]
        )  # R_i_c2w^T @ R_{i+d}_c2w
        t_rel = jnp.einsum(
            "kji,kj->ki", r_c2w[:-delta], c[delta:] - c[:-delta]
        )
        return r_rel, t_rel

    r_est, t_est = rel_motion(estimated_poses)
    r_true, t_true = rel_motion(true_poses)
    r_err = jnp.einsum("kji,kjl->kil", r_true, r_est)
    t_err = jnp.linalg.norm(t_est - t_true, axis=-1)
    # rotation angle from the trace (clamped for roundoff)
    cos_a = jnp.clip(
        (jnp.trace(r_err, axis1=-2, axis2=-1) - 1.0) / 2.0, -1.0, 1.0
    )
    ang = jnp.arccos(cos_a)
    return {
        "trans_rmse": jnp.sqrt(jnp.mean(jnp.square(t_err))),
        "trans_mean": jnp.mean(t_err),
        "rot_rmse": jnp.sqrt(jnp.mean(jnp.square(ang))),
        "rot_mean": jnp.mean(ang),
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
