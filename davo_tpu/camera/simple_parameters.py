"""12-parameter single-view camera layout with two-vector orientation.

Layout ``[cx, cy, f, a1, a2, a3, b1, b2, b3, tx, ty, tz]`` where the two
3-vectors ``a`` (forward) and ``b`` (down) orthonormalise into the camera
rotation (:func:`davo_tpu.geometry.two_vector_rotation_matrix`).

Feature parity target: ``camera_model/simple_camera_model_parameters.py``
in the reference (make/stack constructors).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from davo_tpu.geometry import two_vector_rotation_matrix

__all__ = ["SimpleCameraModelParameters", "NUM_SIMPLE_CAMERA_PARAMS"]

NUM_SIMPLE_CAMERA_PARAMS = 12


class SimpleCameraModelParameters(NamedTuple):
    """Single-view camera parameters with arbitrary leading batch dims."""

    cx: jax.Array
    cy: jax.Array
    focal_length: jax.Array
    a: jax.Array  # (..., 3) forward basis vector
    b: jax.Array  # (..., 3) down basis vector
    translation: jax.Array  # (..., 3)

    @classmethod
    def make(cls, vector: jax.Array) -> "SimpleCameraModelParameters":
        """Unpack a ``(..., 12)`` vector in the canonical layout."""
        if vector.shape[-1] != NUM_SIMPLE_CAMERA_PARAMS:
            raise ValueError(
                f"Expected {NUM_SIMPLE_CAMERA_PARAMS} parameters, got "
                f"{vector.shape[-1]}"
            )
        return cls(
            cx=vector[..., 0],
            cy=vector[..., 1],
            focal_length=vector[..., 2],
            a=vector[..., 3:6],
            b=vector[..., 6:9],
            translation=vector[..., 9:12],
        )

    @classmethod
    def stack(
        cls, items: Sequence["SimpleCameraModelParameters"], axis: int = 0
    ) -> "SimpleCameraModelParameters":
        """Stack several parameter sets along a new batch axis."""
        return cls(
            *(
                jnp.stack([getattr(i, f) for i in items], axis=axis)
                for f in cls._fields
            )
        )

    def as_vector(self) -> jax.Array:
        return jnp.concatenate(
            [
                self.cx[..., None],
                self.cy[..., None],
                self.focal_length[..., None],
                self.a,
                self.b,
                self.translation,
            ],
            axis=-1,
        )

    def rotation_matrix(self) -> jax.Array:
        """Orthonormalised camera rotation, ``(..., 3, 3)``."""
        return two_vector_rotation_matrix(self.a, self.b)

    def project(self, points: jax.Array) -> jax.Array:
        """Project world points ``(..., N, 3)`` to pixels ``(..., N, 2)``.

        Points are expressed in camera coordinates via the two-vector
        rotation (columns = camera axes, so world->camera uses ``R^T``)
        plus the translation, then through the 3-parameter pinhole.
        """
        rot = self.rotation_matrix()
        cam = (
            jnp.einsum("...ji,...nj->...ni", rot, points)
            + self.translation[..., None, :]
        )
        f = self.focal_length[..., None]
        u = f * cam[..., 0] / cam[..., 2] + self.cx[..., None]
        v = f * cam[..., 1] / cam[..., 2] + self.cy[..., None]
        return jnp.stack([u, v], axis=-1)
