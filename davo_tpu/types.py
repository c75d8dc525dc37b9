"""Tensor-bundle types shared across the framework.

NamedTuples are pytrees, so these flow through ``jit`` / ``vmap`` /
``shard_map`` unchanged.  Feature parity target: the reference's
``base_types`` package (``base_types/__init__.py``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax

__all__ = [
    "CameraViewsAndPoints",
    "FeaturePoints",
    "MatchedPoints",
    "ErrorAndGradient",
    "PointsAndJacobian",
]


class CameraViewsAndPoints(NamedTuple):
    """A batch of synthetic multi-view scenes (the canonical batch schema,
    reference ``base_types/camera_views_and_points.py:21-33``).

    * ``projected_points``: ``(B, M, N, 2)`` pixel observations.
    * ``visibility_mask``: ``(B, M, N)`` bool, in-image-bounds flags.
    * ``camera_intrinsics``: ``(B, 3)`` — ``(f, cx, cy)``.
    * ``camera_orientations``: ``(B, M-1, 3)`` axis-angle (view 1 = identity).
    * ``camera_translations``: ``(B, M-1, 3)``.
    * ``world_points``: ``(B, N, 3)`` in the frame of view 1.
    """

    projected_points: jax.Array
    visibility_mask: jax.Array
    camera_intrinsics: jax.Array
    camera_orientations: jax.Array
    camera_translations: jax.Array
    world_points: jax.Array


class FeaturePoints(NamedTuple):
    """Detected feature locations + descriptors from an image.

    ``scores`` (optional) are detection-confidence logits used to select
    the strongest features for the solver (the reference's detector
    design stops at points+descriptors; the score head is the working
    realisation's addition that makes fixed-N selection possible under
    jit)."""

    points: jax.Array  # (B, K, 2)
    descriptors: jax.Array  # (B, K, D)
    scores: Optional[jax.Array] = None  # (B, K) logits


class MatchedPoints(NamedTuple):
    """Corresponding point coordinates between two views."""

    points_a: jax.Array  # (B, K, 2)
    points_b: jax.Array  # (B, K, 2)


class ErrorAndGradient(NamedTuple):
    error: jax.Array
    gradient: jax.Array


class PointsAndJacobian(NamedTuple):
    """Projected points plus their Jacobian w.r.t. model parameters
    (reference ``base_types/points_and_jacobian.py:5-13``)."""

    points: jax.Array  # (B, F, N, 2)
    jacobian: jax.Array  # (B, F, N, 2, P)
