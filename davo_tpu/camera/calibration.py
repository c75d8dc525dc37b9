"""Functional multi-view calibration objective (flat parameter vector).

This is the user-facing "autograd" objective flavour: a flat
``(..., 3 + 3N + 6(M-1))`` parameter vector is unpacked into intrinsics,
world points, and per-view poses (view 1 pinned at the origin/identity),
the scene is gauge-rescaled, and the reprojection error is the projective
angle between each observed pixel ray and the camera-relative point.

Feature parity targets in the reference repo:
``camera_model/calibration_pinhole_camera_model.py`` and the inner error
function of ``networks/calibration_network.py:58-67``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from davo_tpu.geometry import (
    rotate_vector_axis_angle,
    pixel_coordinates_to_homogeneous,
    projective_plane_angle_distance,
)

__all__ = [
    "CalibrationParameters",
    "num_calibration_parameters",
    "unpack_calibration_parameters",
    "pack_calibration_parameters",
    "get_camera_relative_points",
    "calibration_error",
    "BasinScoreConfig",
    "basin_score",
]


class CalibrationParameters(NamedTuple):
    """Parameter slices of the flat calibration vector.

    Shapes (for leading batch dims ``B...``):

    * ``intrinsics``: ``(B..., 1, 1, 3)`` — ``(f, cx, cy)``.
    * ``world_points``: ``(B..., 1, N, 3)``.
    * ``camera_translations``: ``(B..., M-1, 1, 3)``.
    * ``camera_rotations``: ``(B..., M-1, 1, 3)`` axis-angle.
    """

    intrinsics: jax.Array
    world_points: jax.Array
    camera_translations: jax.Array
    camera_rotations: jax.Array


def num_calibration_parameters(num_views: int, num_points: int) -> int:
    """``P = 3 + 3N + 6(M - 1)`` (view 1 pinned at identity)."""
    return 3 + 3 * num_points + 6 * (num_views - 1)


def unpack_calibration_parameters(
    parameters: jax.Array, num_views: int, num_points: int
) -> CalibrationParameters:
    """Split a flat parameter vector into calibration parameter slices.

    Reference: ``camera_model/calibration_pinhole_camera_model.py:33-75``.
    """
    expected = num_calibration_parameters(num_views, num_points)
    if parameters.shape[-1] != expected:
        raise ValueError(
            f"The final dimension of the parameters must be "
            f"3 + 3*num_points + 6*(num_views - 1) = {expected}, "
            f"got {parameters.shape[-1]}"
        )
    batch = parameters.shape[:-1]
    points_end = 3 + 3 * num_points
    translations_end = points_end + 3 * (num_views - 1)
    return CalibrationParameters(
        intrinsics=parameters[..., 0:3].reshape(batch + (1, 1, 3)),
        world_points=parameters[..., 3:points_end].reshape(batch + (1, num_points, 3)),
        camera_translations=parameters[..., points_end:translations_end].reshape(
            batch + (num_views - 1, 1, 3)
        ),
        camera_rotations=parameters[..., translations_end:].reshape(
            batch + (num_views - 1, 1, 3)
        ),
    )


def pack_calibration_parameters(params: CalibrationParameters) -> jax.Array:
    """Inverse of :func:`unpack_calibration_parameters`."""
    batch = params.intrinsics.shape[:-3]
    flat = lambda x: x.reshape(batch + (-1,))
    return jnp.concatenate(
        [
            flat(params.intrinsics),
            flat(params.world_points),
            flat(params.camera_translations),
            flat(params.camera_rotations),
        ],
        axis=-1,
    )


def get_camera_relative_points(
    world_points: jax.Array,
    camera_translations: jax.Array,
    camera_rotations: jax.Array,
) -> jax.Array:
    """Express N world points relative to each of M camera views.

    View 1 is the identity (its points are the world points themselves);
    the remaining ``M-1`` views apply an axis-angle rotation and a
    translation.  Before transforming, the whole scene is uniformly rescaled
    so the mean |coordinate| over points and camera centres is 1 — this
    fixes the gauge scale so the optimisation cannot shrink the scene to
    zero.  Reference:
    ``camera_model/calibration_pinhole_camera_model.py:78-117``.

    :param world_points: ``(..., 1, N, 3)``.
    :param camera_translations: ``(..., M-1, 1, 3)``.
    :param camera_rotations: ``(..., M-1, 1, 3)``.
    :return: ``(..., M, N, 3)`` camera-relative points.
    """
    num_points = world_points.shape[-2]
    num_views = camera_translations.shape[-3] + 1
    points_scale = jnp.mean(jnp.abs(world_points), axis=(-1, -2, -3))
    camera_scale = jnp.mean(jnp.abs(camera_translations), axis=(-1, -2, -3))
    overall_scale = (points_scale * num_points + camera_scale * num_views) / (
        num_points + num_views
    )
    # Guard a degenerate all-zero scene (e.g. an untrained guess network):
    # without the floor the rescale divides by ~0 and the whole solve NaNs
    # in float32 (the reference divides unguarded, ``:103-104``).
    overall_scale = jnp.maximum(overall_scale, 1e-6)[..., None, None, None]
    world_points = world_points / overall_scale
    camera_translations = camera_translations / overall_scale
    rotated = rotate_vector_axis_angle(world_points, camera_rotations)
    transformed = rotated + camera_translations
    return jnp.concatenate(
        [jnp.broadcast_to(world_points, world_points.shape), transformed], axis=-3
    )


def calibration_error(
    parameters: jax.Array,
    true_projected_points: jax.Array,
    visibility_mask: jax.Array,
) -> jax.Array:
    """Total reprojection angle error of a calibration parameter vector.

    For every view/point, lifts the observed pixel to the homogeneous ray it
    parameterises and measures the projective-plane angle to the
    camera-relative 3D point; invisible observations are masked out.

    :param parameters: ``(B..., P)`` flat calibration vectors.
    :param true_projected_points: ``(B..., M, N, 2)`` observed pixels.
    :param visibility_mask: ``(B..., M, N)`` boolean/float visibility.
    :return: ``(B...,)`` summed masked angular error.

    Reference: the inner error function of
    ``networks/calibration_network.py:58-67``.
    """
    num_views = true_projected_points.shape[-3]
    num_points = true_projected_points.shape[-2]
    params = unpack_calibration_parameters(parameters, num_views, num_points)
    rays = pixel_coordinates_to_homogeneous(true_projected_points, params.intrinsics)
    relative_points = get_camera_relative_points(
        world_points=params.world_points,
        camera_translations=params.camera_translations,
        camera_rotations=params.camera_rotations,
    )
    distance = projective_plane_angle_distance(rays, relative_points)
    return jnp.sum(distance * visibility_mask, axis=(-1, -2))


def calibration_residuals(
    parameters: jax.Array,
    true_projected_points: jax.Array,
) -> jax.Array:
    """Per-observation reprojection angle distances ``(B..., M, N)``.

    The un-reduced form of :func:`calibration_error` (no visibility
    weighting) — the residual map for outlier diagnosis / IRLS
    reweighting of learned matches."""
    num_views = true_projected_points.shape[-3]
    num_points = true_projected_points.shape[-2]
    params = unpack_calibration_parameters(parameters, num_views, num_points)
    rays = pixel_coordinates_to_homogeneous(
        true_projected_points, params.intrinsics
    )
    relative_points = get_camera_relative_points(
        world_points=params.world_points,
        camera_translations=params.camera_translations,
        camera_rotations=params.camera_rotations,
    )
    return projective_plane_angle_distance(rays, relative_points)


@dataclasses.dataclass(frozen=True)
class BasinScoreConfig:
    """Weights for :func:`basin_score`.

    The calibration objective is projectively ambiguous from weak starts:
    spurious basins reach low reprojection error with a focal length far
    from truth, so raw reprojection error is a poor model-selection
    criterion for multi-start solving.  The basin score adds *flat-bottom*
    plausibility penalties — zero anywhere inside the domain the synthetic
    data generator samples from (:mod:`davo_tpu.data.synthetic`: FOV
    30-120 degrees so effective focal in [0.577, 3.73]; principal point
    clamped to +-0.5) plus a cheirality term (visible points must lie in
    front of their cameras after the gauge rescale).
    """

    # log of the elu(f)+1 effective focal; bounds of the data domain.
    log_focal_bounds: tuple = (-0.55, 1.32)
    focal_weight: float = 1.0
    centre_bound: float = 0.5
    centre_weight: float = 1.0
    # minimum camera-frame depth (scene is gauge-rescaled to mean |coord| 1)
    depth_margin: float = 0.05
    depth_weight: float = 1.0
    # Quadratic pull of each estimate's log-focal towards an anchor (the
    # guess network's predicted focal, passed by the caller): the guess is
    # trained supervised and is the trusted intrinsics signal, while lower
    # reprojection error is NOT closer to truth under the projective
    # ambiguity — restarts should improve geometry, not re-pick the focal.
    anchor_weight: float = 0.0


def basin_score(
    parameters: jax.Array,
    true_projected_points: jax.Array,
    visibility_mask: jax.Array,
    config: BasinScoreConfig = BasinScoreConfig(),
    anchor_log_focal: jax.Array | None = None,
) -> jax.Array:
    """Reprojection error plus plausibility penalties for basin selection.

    Lower is better.  Inside the plausible domain the score equals
    :func:`calibration_error` exactly, so selection is unchanged whenever
    all restarts land in plausible basins; estimates with implausible
    intrinsics or points behind cameras are pushed out of contention even
    when their raw reprojection error is lower (the projective-ambiguity
    failure mode measured in ROADMAP.md).

    :param parameters: ``(B..., P)`` flat calibration vectors.
    :param true_projected_points: ``(B..., M, N, 2)`` observed pixels.
    :param visibility_mask: ``(B..., M, N)`` boolean/float visibility.
    :return: ``(B...,)`` scores.
    """
    num_views = true_projected_points.shape[-3]
    num_points = true_projected_points.shape[-2]
    error = calibration_error(parameters, true_projected_points, visibility_mask)
    params = unpack_calibration_parameters(parameters, num_views, num_points)

    # effective focal matches pixel_coordinates_to_homogeneous: elu(f) + 1
    f_eff = jax.nn.elu(params.intrinsics[..., 0, 0, 0]) + 1.0
    log_f = jnp.log(jnp.maximum(f_eff, 1e-6))
    lo, hi = config.log_focal_bounds
    focal_penalty = jnp.square(jax.nn.relu(log_f - hi)) + jnp.square(
        jax.nn.relu(lo - log_f)
    )

    centre = params.intrinsics[..., 0, 0, 1:3]
    centre_penalty = jnp.sum(
        jnp.square(jax.nn.relu(jnp.abs(centre) - config.centre_bound)), axis=-1
    )

    relative = get_camera_relative_points(
        world_points=params.world_points,
        camera_translations=params.camera_translations,
        camera_rotations=params.camera_rotations,
    )
    vis = visibility_mask.astype(error.dtype)
    behind = jnp.square(jax.nn.relu(config.depth_margin - relative[..., 2]))
    depth_penalty = jnp.sum(behind * vis, axis=(-1, -2)) / jnp.maximum(
        jnp.sum(vis, axis=(-1, -2)), 1.0
    )

    score = (
        error
        + config.focal_weight * focal_penalty
        + config.centre_weight * centre_penalty
        + config.depth_weight * depth_penalty
    )
    if config.anchor_weight > 0.0 and anchor_log_focal is not None:
        score = score + config.anchor_weight * jnp.square(
            log_f - anchor_log_focal
        )
    return score
