"""Distances between homogeneous projective-plane coordinates.

Feature parity targets: ``geometry/projective_plane_angle_distance.py`` and
``geometry/projective_plane_cosine_distance.py`` in the reference repo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from davo_tpu.utils.guards import safe_norm

__all__ = [
    "projective_plane_angle_distance",
    "projective_plane_cosine_distance",
]

_NORM_FLOOR = 2.220446049250313e-16


def _normalise(v: jax.Array) -> jax.Array:
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, jnp.asarray(_NORM_FLOOR, dtype=v.dtype))


def projective_plane_angle_distance(
    projective_points_a: jax.Array,
    projective_points_b: jax.Array,
    keepdim: bool = False,
) -> jax.Array:
    """Angle between two homogeneous coordinates viewed as vectors in R^3,
    in [0, pi], using Kahan's numerically-stable formulation

        theta = 2 atan2(|a/|a| - b/|b||, |a/|a| + b/|b||)

    (the two diagonals of the parallelogram of the unit vectors form a right
    triangle whose angle is half the angle between the vectors).  Produces
    NaN for the invalid coordinate (0:0:0).

    Reference: ``geometry/projective_plane_angle_distance.py:20-64``.
    """
    a = _normalise(projective_points_a)
    b = _normalise(projective_points_b)
    # safe_norm: at an exact zero distance (or exactly opposite vectors)
    # the norm's derivative is taken as 0 instead of NaN, so perfectly
    # matched observations don't poison the objective's gradient.
    diff = safe_norm(a - b, keepdims=keepdim)
    summ = safe_norm(a + b, keepdims=keepdim)
    return 2.0 * jnp.arctan2(diff, summ)


def projective_plane_cosine_distance(
    projective_points_a: jax.Array,
    projective_points_b: jax.Array,
) -> jax.Array:
    """``1 - cos`` of the angle between homogeneous coordinates in R^3;
    ranges over [0, 2].  Reference:
    ``geometry/projective_plane_cosine_distance.py:21-41``.
    """
    a = _normalise(projective_points_a)
    b = _normalise(projective_points_b)
    return 1.0 - jnp.sum(a * b, axis=-1)
