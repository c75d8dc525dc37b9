"""Brown–Conrady distorted camera model (16 parameters) with batched
Jacobians.

Parameter vector layout (``(..., 16)``), matching the order documented in
the reference (``camera_model/distorted_camera_model.py:24-113``, whose
index constants come from a missing external package — the order below is
the one its math uses):

    [cx, cy, k1, k2, k3, p1, p2, fx, s, fy, rx, ry, rz, tx, ty, tz]

* Extrinsics: Euler angles (rx, ry, rz) composed as ``Rz @ Ry @ Rx`` plus a
  translation.
* Intrinsics: focal lengths ``fx, fy`` and skew ``s``.
* Distortion: radial ``k1, k2, k3`` and tangential ``p1, p2``
  (Brown–Conrady) applied to the normalised pinhole coordinates.

The reference hand-derives the full 2N x 16 Jacobian (``:114-385``); here
the forward model is a pure function and the Jacobian comes from
``jax.jacfwd`` over the 16 parameters — the idiomatic JAX equivalent (16
forward tangents, fused by XLA, exactly equal to the closed form).
Intended for Gauss–Newton / Levenberg–Marquardt refinement
(:mod:`davo_tpu.solve.least_squares`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from davo_tpu.utils import full_f32_matmuls

__all__ = [
    "DISTORTED_PARAM_NAMES",
    "NUM_DISTORTED_PARAMS",
    "distorted_project",
    "distorted_project_and_jacobian",
]

DISTORTED_PARAM_NAMES = (
    "cx", "cy", "k1", "k2", "k3", "p1", "p2",
    "fx", "s", "fy", "rx", "ry", "rz", "tx", "ty", "tz",
)
NUM_DISTORTED_PARAMS = 16

CX, CY, K1, K2, K3, P1, P2, FX, S, FY, RX, RY, RZ, TX, TY, TZ = range(16)


def _euler_zyx_matrix(rx, ry, rz):
    """``Rz(rz) @ Ry(ry) @ Rx(rx)`` (the composition the reference's
    explicit row formulas implement, ``:38-55``)."""
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    row0 = jnp.stack([cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz], -1)
    row1 = jnp.stack([cy * sz, sx * sy * sz + cx * cz, cx * sy * sz - sx * cz], -1)
    row2 = jnp.stack([-sy, sx * cy, cx * cy], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


@full_f32_matmuls
def distorted_project(points_3d: jax.Array, parameters: jax.Array) -> jax.Array:
    """Project world points through the 16-parameter distorted camera.

    :param points_3d: ``(..., N, 3)`` world points.
    :param parameters: ``(..., 16)`` model parameters.
    :return: ``(..., N, 2)`` distorted pixel coordinates.
    """
    p = parameters[..., None, :]  # broadcast over points
    rot = _euler_zyx_matrix(
        parameters[..., RX], parameters[..., RY], parameters[..., RZ]
    )
    cam = jnp.einsum("...ij,...nj->...ni", rot, points_3d)
    cam = cam + jnp.stack(
        [parameters[..., TX], parameters[..., TY], parameters[..., TZ]], -1
    )[..., None, :]
    z = cam[..., 2]
    z = jnp.where(z == 0.0, 1e-8, z)
    x_on_z = cam[..., 0] / z
    y_on_z = cam[..., 1] / z
    u = p[..., FX] * x_on_z + p[..., S] * y_on_z
    v = p[..., FY] * y_on_z
    r2 = u * u + v * v
    radial = 1.0 + p[..., K1] * r2 + p[..., K2] * r2 * r2 + p[..., K3] * r2 * r2 * r2
    uv = u * v
    u_prime = (
        u * radial
        + 2.0 * p[..., P1] * uv
        + p[..., P2] * (r2 + 2.0 * u * u)
        + p[..., CX]
    )
    v_prime = (
        v * radial
        + 2.0 * p[..., P2] * uv
        + p[..., P1] * (r2 + 2.0 * v * v)
        + p[..., CY]
    )
    return jnp.stack([u_prime, v_prime], axis=-1)


def distorted_project_and_jacobian(
    points_3d: jax.Array, parameters: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Projection plus the batched Jacobian w.r.t. the 16 parameters.

    :return: ``(pixels, jacobian)`` with shapes ``(..., N, 2)`` and
        ``(..., N, 2, 16)`` (the reference's closed-form 2N x 16 Jacobian,
        ``:114-385``, obtained via forward-mode autodiff).
    """

    def project_flat(params, pts):
        return distorted_project(pts, params)

    jac_fn = jax.jacfwd(project_flat, argnums=0)
    batch_ndim = parameters.ndim - 1
    for _ in range(batch_ndim):
        jac_fn = jax.vmap(jac_fn)
    return distorted_project(points_3d, parameters), jac_fn(parameters, points_3d)
