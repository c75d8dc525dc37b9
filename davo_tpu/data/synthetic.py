"""On-device synthetic oracle-match scene generation.

Generates batches of multi-view calibration problems entirely on the
accelerator with ``jax.random`` — the TPU-native replacement for the
reference's CPU ``DataLoader`` worker processes
(``data/camera_and_parameters_dataset.py`` + ``data_modules/``).  The whole
generator jits, fuses into the training step, and shards over a device
mesh, so there is no host<->device transfer in the input pipeline at all.

Sampling scheme (mirroring the reference's intent, with its syntax errors
fixed — see SURVEY.md §2.9):

* N world points in front of view 1: ``z ~ |N(20, 5)|``, ``xy ~ N(0, 3)``.
* View 1 is the identity pose; ``M - 1`` further views are look-at poses:
  perturbed camera locations, view targets near the point centroid, and a
  perturbed "up" reference, Gram–Schmidt orthonormalised into a rotation
  (x = right, y = down, z = forward) and converted to axis-angle on-device.
* Cameras are pushed back along their forward axis until every point is at
  least ``min_camera_distance`` in front.
* Intrinsics from a FOV uniform in [30 deg, 120 deg]: ``f = 1/tan(fov/2)``;
  principal point ``clip(0.2 N(0,1), +-0.5)``.
* Observations are pinhole projections; visibility = inside [-1, 1]^2.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from davo_tpu.geometry import axis_angle_from_matrix, rotate_vector_axis_angle
from davo_tpu.types import CameraViewsAndPoints

__all__ = ["SceneConfig", "generate_scene", "generate_batch"]


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Scene sampling hyper-parameters (reference defaults,
    ``data/camera_and_parameters_dataset.py:33-62``)."""

    num_views: int = 4
    num_points: int = 8
    min_camera_distance: float = 0.1
    camera_distance_mean: float = 20.0
    camera_distance_std: float = 5.0
    camera_location_spread: float = 3.0
    camera_target_spread: float = 3.0
    camera_up_spread: float = 3.0
    points_std: float = 3.0
    # FOV sampling range (reference fixes 30-120 deg,
    # ``data/camera_and_parameters_dataset.py:147-151``); narrowing it
    # supports curriculum training of the guess network.
    fov_min_degrees: float = 30.0
    fov_max_degrees: float = 120.0
    # Observation-noise augmentation (std, [-1,1] pixel units); 0 = the
    # reference's exact projections.  Visibility is evaluated on the
    # noisy pixels — the mask a real front-end would emit.
    pixel_noise: float = 0.0
    dtype: jnp.dtype = jnp.float32


def _look_at_rotation(forward: jax.Array, up_ref: jax.Array) -> jax.Array:
    """Rows [right, down, forward]: world -> camera (CV convention,
    x right / y down / z forward), guaranteed right-handed (det = +1).

    The reference's row construction ``[-left, -up, forward]`` with
    ``left = forward x up`` is left-handed (a reflection) — its generator
    never ran due to unrelated syntax errors (SURVEY.md §2.9)."""
    forward = forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)
    up = up_ref - forward * jnp.sum(forward * up_ref, axis=-1, keepdims=True)
    up = up / jnp.linalg.norm(up, axis=-1, keepdims=True)
    down = -up
    right = jnp.cross(down, forward)
    return jnp.stack([right, down, forward], axis=-2)


def generate_scene(key: jax.Array, config: SceneConfig) -> CameraViewsAndPoints:
    """Generate one scene (no batch dimension)."""
    dtype = config.dtype
    n, m = config.num_points, config.num_views
    k_pts, k_updist, k_target, k_loc, k_tspread, k_upspread, k_fov, k_centre = (
        jax.random.split(key, 8)
    )

    # --- world points (frame of view 1, z > 0) --------------------------
    z = config.camera_distance_mean + config.camera_distance_std * jax.random.normal(
        k_pts, (n, 1), dtype
    )
    kxy = jax.random.fold_in(k_pts, 1)
    xy = config.points_std * jax.random.normal(kxy, (n, 2), dtype)
    world_points = jnp.concatenate([xy, jnp.abs(z)], axis=-1)

    # --- extra camera poses (M - 1 look-at views) -----------------------
    num_extra = m - 1
    up_distance = jnp.abs(
        config.camera_distance_mean
        + config.camera_distance_std * jax.random.normal(k_updist, (), dtype)
    )
    target_base = jnp.mean(world_points, axis=0) * (
        1.0 + jax.random.uniform(k_target, (), dtype)
    ) + (config.points_std / 2.0) * jax.random.normal(
        jax.random.fold_in(k_target, 1), (3,), dtype
    )
    up_base = up_distance * jnp.asarray([0.0, -1.0, 0.0], dtype)

    locations = config.camera_location_spread * jax.random.normal(
        k_loc, (num_extra, 3), dtype
    )
    targets = target_base + config.camera_target_spread * jax.random.normal(
        k_tspread, (num_extra, 3), dtype
    )
    ups = up_base + config.camera_up_spread * jax.random.normal(
        k_upspread, (num_extra, 3), dtype
    )

    rotations_mat = _look_at_rotation(targets - locations, ups - locations)
    forward = rotations_mat[..., 2, :]

    # Push cameras back so every point is >= min_camera_distance in front.
    depths = jnp.sum(
        forward[:, None, :] * (world_points[None, :, :] - locations[:, None, :]),
        axis=-1,
    )
    shortfall = jnp.min(depths, axis=-1) - config.min_camera_distance
    backoff = jnp.where(shortfall < 0.0, shortfall, 0.0)
    locations = locations + backoff[:, None] * forward

    orientations = axis_angle_from_matrix(rotations_mat)
    # camera-relative point: p_cam = R p + t with t = -R location
    translations = -jnp.einsum("vij,vj->vi", rotations_mat, locations)

    # --- intrinsics -----------------------------------------------------
    fov_lo = jnp.deg2rad(jnp.asarray(config.fov_min_degrees, dtype))
    fov_span = jnp.deg2rad(
        jnp.asarray(config.fov_max_degrees - config.fov_min_degrees, dtype)
    )
    fov = fov_lo + fov_span * jax.random.uniform(k_fov, (), dtype)
    focal_length = 1.0 / jnp.tan(fov / 2.0)
    centre = jnp.clip(
        0.2 * jax.random.normal(k_centre, (2,), dtype), -0.5, 0.5
    )
    intrinsics = jnp.concatenate([focal_length[None], centre])

    # --- project to every view ------------------------------------------
    relative_extra = (
        rotate_vector_axis_angle(world_points[None, :, :], orientations[:, None, :])
        + translations[:, None, :]
    )
    relative = jnp.concatenate([world_points[None, :, :], relative_extra], axis=0)
    z_rel = jnp.maximum(relative[..., 2], 1e-8)
    u = focal_length * relative[..., 0] / z_rel + centre[0]
    v = focal_length * relative[..., 1] / z_rel + centre[1]
    projected = jnp.stack([u, v], axis=-1)
    if config.pixel_noise > 0.0:
        projected = projected + config.pixel_noise * jax.random.normal(
            jax.random.fold_in(key, 101), projected.shape, dtype
        )
        u, v = projected[..., 0], projected[..., 1]
    visibility = (
        (u > -1.0) & (u < 1.0) & (v > -1.0) & (v < 1.0) & (relative[..., 2] > 0.0)
    )

    return CameraViewsAndPoints(
        projected_points=projected,
        visibility_mask=visibility,
        camera_intrinsics=intrinsics,
        camera_orientations=orientations,
        camera_translations=translations,
        world_points=world_points,
    )


def generate_batch(
    key: jax.Array, batch_size: int, config: SceneConfig
) -> CameraViewsAndPoints:
    """Generate ``batch_size`` independent scenes, vmapped on-device."""
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: generate_scene(k, config))(keys)
