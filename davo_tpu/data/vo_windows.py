"""On-device generation of VO-style keyframe-window scenes.

The base synthetic generator (:mod:`davo_tpu.data.synthetic`) samples
near-static camera clusters looking at a distant cloud — the right
distribution for the reference's calibration experiment, but far from the
geometry a visual-odometry window sees (cameras spaced along a trajectory
arc, wide baselines, all sides of the structure).  Training the guess
network on this distribution closes the domain gap for the windowed VO
pipeline (:mod:`davo_tpu.train.vo_eval`).

Each sample: a point cloud at the origin, M cameras on a random orbit-arc
segment (random radius, start angle, angular step, vertical bob), poses
re-expressed relative to the first camera (the ``CameraViewsAndPoints``
convention: world frame = view 1).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from davo_tpu.geometry import axis_angle_from_matrix
from davo_tpu.types import CameraViewsAndPoints
from .synthetic import _look_at_rotation

__all__ = ["VOWindowConfig", "generate_vo_window_batch"]


@dataclasses.dataclass(frozen=True)
class VOWindowConfig:
    num_views: int = 4
    num_points: int = 8
    points_std: float = 3.0
    min_radius: float = 8.0
    max_radius: float = 16.0
    min_step: float = 0.05  # radians of arc between consecutive keyframes
    max_step: float = 0.3
    bob_amplitude: float = 1.5
    target_jitter: float = 1.5
    min_fov: float = jnp.pi / 6.0
    max_fov: float = 2.0 * jnp.pi / 3.0
    # Observation-noise augmentation: std of Gaussian noise added to the
    # projected pixels (visibility is evaluated on the NOISY pixels — the
    # mask a real front-end would emit).  Matters for robustness: a guess
    # head trained on exact projections is brittle to the ~0.01-0.05
    # coordinate noise of learned matches.
    pixel_noise: float = 0.0
    # Verified-match-distribution augmentation (round-2 diagnosis,
    # scripts/diagnose_learned_matches.py): the visual front-end's
    # verification gates leave only ~2-5 of 8 matches per non-anchor
    # view, and ~2% of survivors are wrong assignments.  A guess head
    # trained on full-visibility exact windows is OOD there.
    # Per non-anchor view m, draw d_m ~ U(0, visibility_dropout) and
    # drop each visible observation with probability d_m.
    visibility_dropout: float = 0.0
    # Per visible non-anchor observation, with this probability replace
    # the pixel by ANOTHER point's projection in the same view (a
    # verified-but-wrong assignment; stays marked visible).
    outlier_fraction: float = 0.0
    dtype: jnp.dtype = jnp.float32


def _generate_one(key: jax.Array, config: VOWindowConfig) -> CameraViewsAndPoints:
    dtype = config.dtype
    m, n = config.num_views, config.num_points
    k_pts, k_radius, k_angle, k_step, k_bob, k_target, k_fov, k_centre = (
        jax.random.split(key, 8)
    )
    points = config.points_std * jax.random.normal(k_pts, (n, 3), dtype)

    radius = jax.random.uniform(
        k_radius, (), dtype, config.min_radius, config.max_radius
    )
    start = jax.random.uniform(k_angle, (), dtype, 0.0, 2.0 * jnp.pi)
    step = jax.random.uniform(k_step, (), dtype, config.min_step, config.max_step)
    phase = jax.random.uniform(k_bob, (), dtype, 0.0, 2.0 * jnp.pi)
    angles = start + step * jnp.arange(m, dtype=dtype)
    centres = jnp.stack(
        [
            radius * jnp.sin(angles),
            config.bob_amplitude * jnp.sin(2.0 * angles + phase),
            -radius * jnp.cos(angles),
        ],
        axis=-1,
    )
    target = config.target_jitter * jax.random.normal(k_target, (3,), dtype)
    rot = _look_at_rotation(target - centres, jnp.asarray([0.0, -1.0, 0.0], dtype))

    # re-express everything in the frame of view 1
    r0, c0 = rot[0], centres[0]
    points_v0 = jnp.einsum("ij,nj->ni", r0, points - c0)
    rel_rot = jnp.einsum("mij,kj->mik", rot[1:], r0)  # R_j R0^T
    rel_trans = jnp.einsum("mij,mj->mi", rot[1:], c0 - centres[1:])
    orientations = axis_angle_from_matrix(rel_rot)

    fov = jax.random.uniform(k_fov, (), dtype, config.min_fov, config.max_fov)
    focal = 1.0 / jnp.tan(fov / 2.0)
    centre_px = jnp.clip(0.2 * jax.random.normal(k_centre, (2,), dtype), -0.5, 0.5)
    intrinsics = jnp.concatenate([focal[None], centre_px])

    rel = jnp.concatenate(
        [
            points_v0[None],
            jnp.einsum("mij,nj->mni", rel_rot, points_v0)
            + rel_trans[:, None, :],
        ],
        axis=0,
    )
    z = jnp.maximum(rel[..., 2], 1e-8)
    u = focal * rel[..., 0] / z + centre_px[0]
    v = focal * rel[..., 1] / z + centre_px[1]
    projected = jnp.stack([u, v], axis=-1)
    if config.pixel_noise > 0.0:
        projected = projected + config.pixel_noise * jax.random.normal(
            jax.random.fold_in(key, 101), projected.shape, dtype
        )
        u, v = projected[..., 0], projected[..., 1]
    visibility = (
        (u > -1.0) & (u < 1.0) & (v > -1.0) & (v < 1.0) & (rel[..., 2] > 0.1)
    )
    if config.outlier_fraction > 0.0:
        k_sel, k_other = jax.random.split(jax.random.fold_in(key, 102))
        swap = jax.random.bernoulli(
            k_sel, config.outlier_fraction, (m, n)
        ) & visibility
        swap = swap.at[0].set(False)  # anchor view stays clean
        # wrong assignment: another point's projection in the same view
        shift = jax.random.randint(k_other, (m, n), 1, n)
        other = (jnp.arange(n)[None, :] + shift) % n
        wrong_pix = jnp.take_along_axis(projected, other[..., None], axis=1)
        projected = jnp.where(swap[..., None], wrong_pix, projected)
    if config.visibility_dropout > 0.0:
        k_rate, k_drop = jax.random.split(jax.random.fold_in(key, 103))
        rate = jax.random.uniform(
            k_rate, (m, 1), dtype, 0.0, config.visibility_dropout
        )
        drop = jax.random.bernoulli(k_drop, rate, (m, n))
        drop = drop.at[0].set(False)  # anchor view keeps its detections
        visibility = visibility & ~drop
    return CameraViewsAndPoints(
        projected_points=projected,
        visibility_mask=visibility,
        camera_intrinsics=intrinsics,
        camera_orientations=orientations,
        camera_translations=rel_trans,
        world_points=points_v0,
    )


def generate_vo_window_batch(
    key: jax.Array, batch_size: int, config: VOWindowConfig
) -> CameraViewsAndPoints:
    """``batch_size`` independent VO-window scenes, vmapped on-device."""
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: _generate_one(k, config))(keys)
