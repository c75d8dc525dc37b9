"""Pinhole camera projections (basic, clamped, homogeneous).

All functions broadcast over leading batch dimensions and use the
3-parameter intrinsics layout ``(f, cx, cy)``.

Feature parity targets in the reference repo:
``geometry/camera_projection.py``, ``geometry/clamped_camera_projection.py``,
``geometry/homogeneous_projection.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "project_points_basic_pinhole",
    "project_points_clamped_pinhole",
    "pixel_coordinates_to_homogeneous",
    "project_points_pinhole_homogeneous",
]


def project_points_basic_pinhole(
    points: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """``(f * x / z + cx, f * y / z + cy)``.

    :param points: ``(..., 3)`` camera-relative points.
    :param intrinsics: ``(..., 3)`` intrinsics ``(f, cx, cy)``.
    :return: ``(..., 2)`` pixel coordinates.
    """
    focal_length = intrinsics[..., 0:1]
    principal_point = intrinsics[..., 1:3]
    xy = points[..., 0:2]
    z = points[..., 2:3]
    return focal_length * xy / z + principal_point


def project_points_clamped_pinhole(
    points: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Gradient-preserving projection for optimisation.

    Keeps useful gradients alive for points behind the camera and for huge
    projected coordinates, assuming image bounds [-1, 1]:

    * ``z < -1``          : ``u = sign(x) (101 + log|z|) + cx``
    * ``-1 <= z <= ~0``   : ``u = sign(x) (100 - z) + cx``
    * ``z > 0``, projection out of log-bounds (``f + log|x| - log|z| > 0``):
                            ``u = sign(x) (1 + f + log|x| - log|z|) + cx``
    * otherwise           : ``u = e^f x / z + cx``

    The focal length is parameterised as ``e^f`` (strictly positive, small
    parameter changes have large effect), so this function expects
    standard-normal-ish parameters.  Reference:
    ``geometry/clamped_camera_projection.py:20-76``.
    """
    focal_length = intrinsics[..., 0:1]
    principal_point = intrinsics[..., 1:3]
    xy = points[..., 0:2]
    z = points[..., 2:3]

    is_z_large_negative = z < -1.0
    is_z_positive = z > 1e-100
    # Guard log(0) / division by z=0: the guarded branches are never selected
    # where the guards bite (double-where).
    abs_xy = jnp.abs(xy)
    abs_z = jnp.abs(z)
    log_xy = jnp.log(jnp.where(abs_xy == 0.0, 1.0, abs_xy))
    log_z = jnp.log(jnp.where(abs_z == 0.0, 1.0, abs_z))
    sign_xy = jnp.sign(xy)

    negative_projected = sign_xy * jnp.where(
        is_z_large_negative, 101.0 + log_z, 100.0 - z
    )

    log_projection = focal_length + log_xy - log_z
    safe_z = jnp.where(is_z_positive, z, 1.0)
    projection = jnp.exp(focal_length) * xy / safe_z
    in_bounds = log_projection < 0.0
    positive_projected = jnp.where(
        in_bounds, projection, sign_xy * (log_projection + 1.0)
    )

    return principal_point + jnp.where(
        is_z_positive, positive_projected, negative_projected
    )


def _positive_focal_length(intrinsics: jax.Array) -> jax.Array:
    """``elu(f) + 1`` — strictly-positive focal-length parametrisation."""
    return jax.nn.elu(intrinsics[..., 0:1]) + 1.0


def pixel_coordinates_to_homogeneous(
    projected_points: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Convert pixel coordinates to the homogeneous ray they lie on:
    ``(u - cx, v - cy, f')`` with ``f' = elu(f) + 1`` strictly positive.

    Reference: ``geometry/homogeneous_projection.py:21-44``.

    :param projected_points: ``(..., 2)`` pixel coordinates.
    :param intrinsics: ``(..., 3)`` intrinsics ``(f, cx, cy)``.
    :return: ``(..., 3)`` rays, defined up to scale.
    """
    focal_length = _positive_focal_length(intrinsics)
    principal_point = intrinsics[..., 1:3]
    centred = projected_points - principal_point
    focal = jnp.broadcast_to(focal_length, centred.shape[:-1] + (1,))
    return jnp.concatenate([centred, focal], axis=-1)


def project_points_pinhole_homogeneous(
    points: jax.Array, intrinsics: jax.Array
) -> jax.Array:
    """Project camera-relative 3D points to homogeneous projective-plane
    coordinates *without division*: ``(f' x + z cx, f' y + z cy, z)``.

    The invalid coordinate (0:0:0) is replaced by (0:0:1).
    Reference: ``geometry/homogeneous_projection.py:47-77``.
    """
    focal_length = _positive_focal_length(intrinsics)
    principal_point = intrinsics[..., 1:3]
    xy = points[..., 0:2]
    z = points[..., 2:3]
    projected = focal_length * xy + z * principal_point
    is_zero = (z == 0.0) & jnp.all(projected == 0.0, axis=-1, keepdims=True)
    z = jnp.where(is_zero, 1.0, z)
    return jnp.concatenate([projected, z], axis=-1)
