"""Gauge-fixed multi-view pinhole bundle-adjustment objective (L1), with a
fully analytic batched gradient.

This is the flagship gen-1 objective of the reference
(``camera_model/pinhole_camera_model_l1.py``), re-designed functionally:
parameters are a NamedTuple pytree + a flat-vector codec, the error and its
analytic gradient are pure functions over arbitrary leading batch
dimensions ``(B, E, ...)``, and XLA common-subexpression elimination
replaces the reference's hand-maintained lazy caches.

Model: M views of N world points with shared intrinsics ``(f, cx, cy)``,
per-view translation + axis-angle rotation, and free world points.

Gauge fixing (reference ``:406-433``): the first world point is pinned to
the origin, the second to ``[1, 0, 0]`` (fixing scale + x-axis), and the
third to the z=0 plane, so

    P = 3 + 6 M + 3 N - 7

free parameters.  Vector layout (reference ``:273-319``):

    [cx, cy, f,
     a_1..a_M, b_1..b_M, c_1..c_M,          (axis-angle per view)
     tx_1..tx_M, ty_1..ty_M, tz_1..tz_M,
     x_3..x_N, y_3..y_N, z_4..z_N]          (free world-point coords)

(The reference's ``as_parameters_vector`` stacks ``ty`` twice and drops
``tz`` — a latent bug noted in SURVEY.md §2.9; here ``tz`` is stored.)

Depth clamp: the camera-relative depth is clamped to
``max(maximum_pixel_ratio^-1 * max|x', y'|, minimum_z_distance)`` with a
*straight-through* gradient so clamped points keep pulling toward the
camera plane (reference ``:446-463``; its analytic gradient likewise
evaluates at the clamped depth but never differentiates the clamp).

The analytic gradient here is the exact derivative of the error (modulo
the straight-through clamp); the reference's double ``scale_factor``
multiplication and per-term clipping are reproduced only when
``max_gradient > 0`` is requested, and applied once.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from davo_tpu.geometry import (
    rotate_vector_axis_angle,
    so3_parameter_jacobian,
    so3_rotation_matrix,
    wrap_axis_angle,
)
from davo_tpu.utils import straight_through_max

__all__ = [
    "PinholeBAConfig",
    "PinholeBAParams",
    "PinholeBAData",
    "num_ba_parameters",
    "ba_params_to_vector",
    "ba_params_from_vector",
    "ba_add_vector",
    "augmented_world_points",
    "ba_camera_relative_points",
    "ba_project",
    "ba_error",
    "ba_error_and_gradient",
]


@dataclasses.dataclass(frozen=True)
class PinholeBAConfig:
    minimum_z_distance: float = 1e-3
    maximum_pixel_ratio: float = 5.0
    constrain: bool = False
    max_gradient: float = -1.0  # <= 0 disables gradient scaling/clipping
    # "l1" (flagship objective), "l2", or "mixed" (L1 on u, L2 on v — the
    # base-class refactor's intent, reference
    # ``camera_model/pinhole_camera_model.py:483-494``).
    error_norm: str = "l1"


class PinholeBAParams(NamedTuple):
    """BA parameters with arbitrary leading batch dims ``(...)``.

    * ``focal_length``, ``cx``, ``cy``: ``(...)`` shared intrinsics.
    * ``translation``: ``(..., M, 3)``.
    * ``orientation``: ``(..., M, 3)`` axis-angle per view.
    * ``world_points``: ``(..., N-2, 3)`` free points; the first row's z is
      ignored (gauge-fixed to the z=0 plane).
    """

    focal_length: jax.Array
    cx: jax.Array
    cy: jax.Array
    translation: jax.Array
    orientation: jax.Array
    world_points: jax.Array

    @property
    def num_views(self) -> int:
        return self.translation.shape[-2]

    @property
    def num_points(self) -> int:
        return self.world_points.shape[-2] + 2


class PinholeBAData(NamedTuple):
    """Observations: fields broadcast against the parameter batch dims.

    * ``true_projected_points``: ``(..., M, N, 2)``.
    * ``visibility_mask``: ``(..., M, N)`` float or bool.
    """

    true_projected_points: jax.Array
    visibility_mask: jax.Array


def num_ba_parameters(num_views: int, num_points: int) -> int:
    """``P = 3 + 6 M + 3 N - 7`` (reference ``:113-114``)."""
    return 3 + 6 * num_views + 3 * num_points - 7


def ba_params_to_vector(params: PinholeBAParams) -> jax.Array:
    """Flatten to the canonical ``(..., P)`` layout."""
    t = params.translation
    o = params.orientation
    w = params.world_points
    return jnp.concatenate(
        [
            params.cx[..., None],
            params.cy[..., None],
            params.focal_length[..., None],
            o[..., 0],
            o[..., 1],
            o[..., 2],
            t[..., 0],
            t[..., 1],
            t[..., 2],
            w[..., 0],
            w[..., 1],
            w[..., 1:, 2],
        ],
        axis=-1,
    )


def _split_vector(
    vector: jax.Array, num_views: int, num_points: int
) -> PinholeBAParams:
    m = num_views
    n_free = num_points - 2
    idx = 3
    chunks = []
    for size in (m, m, m, m, m, m, n_free, n_free, num_points - 3):
        chunks.append(vector[..., idx : idx + size])
        idx += size
    a, b, c, tx, ty, tz, x, y, z = chunks
    z = jnp.concatenate([jnp.zeros_like(z[..., 0:1]), z], axis=-1)
    return PinholeBAParams(
        focal_length=vector[..., 2],
        cx=vector[..., 0],
        cy=vector[..., 1],
        translation=jnp.stack([tx, ty, tz], axis=-1),
        orientation=jnp.stack([a, b, c], axis=-1),
        world_points=jnp.stack([x, y, z], axis=-1),
    )


def ba_params_from_vector(
    vector: jax.Array, num_views: int, num_points: int
) -> PinholeBAParams:
    """Interpret an absolute ``(..., P)`` vector as parameters."""
    expected = num_ba_parameters(num_views, num_points)
    if vector.shape[-1] != expected:
        raise ValueError(
            f"Expected parameter vectors of size {expected} for "
            f"M={num_views}, N={num_points}; got {vector.shape[-1]}"
        )
    return _split_vector(vector, num_views, num_points)


def ba_add_vector(
    params: PinholeBAParams,
    delta: jax.Array,
    config: PinholeBAConfig = PinholeBAConfig(),
) -> PinholeBAParams:
    """Apply a flat parameter-vector step (reference ``add``, ``:295-347``).

    With ``config.constrain``, the rotation wraps to [-pi, pi], the focal
    length clamps to ``[1/maximum_pixel_ratio, 1e3]``, and the principal
    point to ``[-1, 1]``.
    """
    d = ba_params_from_vector(delta, params.num_views, params.num_points)
    focal = params.focal_length + d.focal_length
    cx = params.cx + d.cx
    cy = params.cy + d.cy
    orientation = params.orientation + d.orientation
    if config.constrain:
        orientation = wrap_axis_angle(orientation)
        focal = jnp.clip(focal, 1.0 / abs(config.maximum_pixel_ratio), 1e3)
        cx = jnp.clip(cx, -1.0, 1.0)
        cy = jnp.clip(cy, -1.0, 1.0)
    return PinholeBAParams(
        focal_length=focal,
        cx=cx,
        cy=cy,
        translation=params.translation + d.translation,
        orientation=orientation,
        world_points=params.world_points + d.world_points,
    )


def augmented_world_points(params: PinholeBAParams) -> jax.Array:
    """``(..., N, 3)``: gauge points ``[0,0,0]``, ``[1,0,0]``,
    ``[x0, y0, 0]`` followed by the free points (reference ``:406-433``)."""
    w = params.world_points
    batch = w.shape[:-2]
    zeros = jnp.zeros(batch + (1, 3), dtype=w.dtype)
    unit_x = jnp.zeros(batch + (1, 3), dtype=w.dtype).at[..., 0, 0].set(1.0)
    third = jnp.concatenate(
        [w[..., 0:1, 0:2], jnp.zeros_like(w[..., 0:1, 2:3])], axis=-1
    )
    return jnp.concatenate([zeros, unit_x, third, w[..., 1:, :]], axis=-2)


def ba_camera_relative_points(
    params: PinholeBAParams, config: PinholeBAConfig = PinholeBAConfig()
) -> jax.Array:
    """``(..., M, N, 3)`` camera-relative points with the straight-through
    depth clamp applied (reference ``:435-465``)."""
    world = augmented_world_points(params)  # (..., N, 3)
    rotated = rotate_vector_axis_angle(
        world[..., None, :, :], params.orientation[..., :, None, :]
    )
    rotated = rotated + params.translation[..., :, None, :]
    inv_ratio = 1.0 / abs(config.maximum_pixel_ratio)
    min_z = jnp.max(jnp.abs(inv_ratio * rotated[..., 0:2]), axis=-1)
    min_z = jnp.maximum(min_z, config.minimum_z_distance)
    z = straight_through_max(
        rotated[..., 2], jax.lax.stop_gradient(min_z)
    )
    return jnp.concatenate([rotated[..., 0:2], z[..., None]], axis=-1)


def ba_project(
    params: PinholeBAParams, config: PinholeBAConfig = PinholeBAConfig()
) -> jax.Array:
    """``(..., M, N, 2)`` projected pixels ``f * xy/z + (cx, cy)``."""
    rel = ba_camera_relative_points(params, config)
    f = params.focal_length[..., None, None]
    centre = jnp.stack([params.cx, params.cy], axis=-1)[..., None, None, :]
    return f[..., None] * rel[..., 0:2] / rel[..., 2:3] + centre


def _error_scale(num_views: int, num_points: int) -> float:
    return float(1.0 / (num_views * num_points)) ** 0.5


def _residual_norms(res_u, res_v, config: PinholeBAConfig):
    """Per-residual error terms + d(term)/d(residual) for the configured
    norm.  L1 => (|r|, sign r); L2 => (r^2, 2r); mixed => L1 on u, L2 on v.
    """
    if config.error_norm == "l1":
        return (jnp.abs(res_u), jnp.abs(res_v), jnp.sign(res_u), jnp.sign(res_v))
    if config.error_norm == "l2":
        return (jnp.square(res_u), jnp.square(res_v), 2.0 * res_u, 2.0 * res_v)
    if config.error_norm == "mixed":
        return (jnp.abs(res_u), jnp.square(res_v), jnp.sign(res_u), 2.0 * res_v)
    raise ValueError(f"Unknown error_norm: {config.error_norm!r}")


def ba_error(
    params: PinholeBAParams,
    data: PinholeBAData,
    config: PinholeBAConfig = PinholeBAConfig(),
) -> jax.Array:
    """Masked reprojection error, scaled by ``sqrt(1/(M N))``;
    shape = the parameter batch dims (reference ``get_error``, ``:132-179``)."""
    uv = ba_project(params, config)
    residuals = uv - data.true_projected_points
    vis = data.visibility_mask.astype(uv.dtype)
    scale = _error_scale(params.num_views, params.num_points)
    # visibility weights the per-residual *error terms* (norm first, then
    # weight) — the same convention as the analytic gradient path, so the
    # two functions agree for fractional visibility weights too.
    err_u, err_v, _, _ = _residual_norms(
        residuals[..., 0], residuals[..., 1], config
    )
    return scale * jnp.sum((err_u + err_v) * vis, axis=(-1, -2))


def ba_error_and_gradient(
    params: PinholeBAParams,
    data: PinholeBAData,
    config: PinholeBAConfig = PinholeBAConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Error plus the fully analytic gradient in the flat layout.

    The hand-assembled chain rule of the reference
    (``_compute_gradient_from_intermediates`` ``:520-642`` +
    ``_stack_gradients`` ``:645-707``), vectorised over ``(..., M, N)``:

        du/d[x'y'z'] = [f/z, 0, -f x/z^2],  dv/d... = [0, f/z, -f y/z^2]
        d[x'y'z']/d(rotation params) = so3_parameter_jacobian
        d[x'y'z']/d(world point)     = R (the rotation matrix)
        d[x'y'z']/d(translation)     = I

    contracted against the L1 residual signs.  With
    ``config.max_gradient > 0`` every partial is scaled by
    ``min(1, max_gradient/z)`` and clipped to ``+-max_gradient`` (applied
    once — the reference multiplies its scale factor twice,
    SURVEY.md §2.9).

    :return: ``(error, gradient)`` with shapes ``(...)`` and ``(..., P)``.
    """
    world = augmented_world_points(params)  # (..., N, 3)
    rel = ba_camera_relative_points(params, config)  # (..., M, N, 3)
    x, y, z = rel[..., 0], rel[..., 1], rel[..., 2]
    f = params.focal_length[..., None, None]
    u = f * x / z + params.cx[..., None, None]
    v = f * y / z + params.cy[..., None, None]

    true_uv = data.true_projected_points
    vis = data.visibility_mask.astype(u.dtype)
    scale = _error_scale(params.num_views, params.num_points)
    res_u = u - true_uv[..., 0]
    res_v = v - true_uv[..., 1]
    err_u, err_v, d_u, d_v = _residual_norms(res_u, res_v, config)
    error = scale * jnp.sum((err_u + err_v) * vis, axis=(-1, -2))
    sign_u = scale * vis * d_u
    sign_v = scale * vis * d_v

    inv_z = 1.0 / z
    f_on_z = f * inv_z
    x_on_z = x * inv_z
    y_on_z = y * inv_z
    du_dx = f_on_z  # d u / d x'
    du_dz = -f_on_z * x_on_z
    dv_dy = f_on_z
    dv_dz = -f_on_z * y_on_z
    du_df = x_on_z
    dv_df = y_on_z

    if config.max_gradient > 0.0:
        g = config.max_gradient
        sf = jnp.minimum(g * inv_z, 1.0)
        clip = lambda t: jnp.clip(sf * t, -g, g)
        du_dx, du_dz = clip(du_dx), clip(du_dz)
        dv_dy, dv_dz = clip(dv_dy), clip(dv_dz)
        du_df, dv_df = clip(du_df), clip(dv_df)

    # Rotation-parameter Jacobian of the rotated point, (..., M, N, 3, 3).
    j_rot = so3_parameter_jacobian(
        world[..., None, :, :], params.orientation[..., :, None, :]
    )
    # World-point Jacobian = rotation matrix, (..., M, 1, 3, 3).
    j_world = so3_rotation_matrix(params.orientation)[..., None, :, :]

    # du/dw_j = du_dx * J[0, j] + du_dz * J[2, j]  (and likewise for v).
    du_drot = du_dx[..., None] * j_rot[..., 0, :] + du_dz[..., None] * j_rot[..., 2, :]
    dv_drot = dv_dy[..., None] * j_rot[..., 1, :] + dv_dz[..., None] * j_rot[..., 2, :]
    du_dworld = (
        du_dx[..., None] * j_world[..., 0, :] + du_dz[..., None] * j_world[..., 2, :]
    )
    dv_dworld = (
        dv_dy[..., None] * j_world[..., 1, :] + dv_dz[..., None] * j_world[..., 2, :]
    )

    if config.max_gradient > 0.0:
        g = config.max_gradient
        sf_e = sf[..., None]
        du_drot = jnp.clip(sf_e * du_drot, -g, g)
        dv_drot = jnp.clip(sf_e * dv_drot, -g, g)
        du_dworld = jnp.clip(sf_e * du_dworld, -g, g)
        dv_dworld = jnp.clip(sf_e * dv_dworld, -g, g)

    # --- reduce into the flat gradient layout ---------------------------
    g_cx = jnp.sum(sign_u, axis=(-1, -2))[..., None]
    g_cy = jnp.sum(sign_v, axis=(-1, -2))[..., None]
    g_f = jnp.sum(sign_u * du_df + sign_v * dv_df, axis=(-1, -2))[..., None]

    # per-view rotation: sum over points -> (..., M, 3)
    g_rot = jnp.sum(
        sign_u[..., None] * du_drot + sign_v[..., None] * dv_drot, axis=-2
    )
    # per-view translation
    g_tx = jnp.sum(sign_u * du_dx, axis=-1)
    g_ty = jnp.sum(sign_v * dv_dy, axis=-1)
    g_tz = jnp.sum(sign_u * du_dz + sign_v * dv_dz, axis=-1)

    # world points: sum over views; points 0,1 fully fixed, point 2 has
    # free x,y only (z gauge-fixed), points 3.. fully free.
    g_world = jnp.sum(
        sign_u[..., None] * du_dworld + sign_v[..., None] * dv_dworld, axis=-3
    )  # (..., N, 3)
    g_x = g_world[..., 2:, 0]
    g_y = g_world[..., 2:, 1]
    g_z = g_world[..., 3:, 2]

    gradient = jnp.concatenate(
        [
            g_cx,
            g_cy,
            g_f,
            g_rot[..., 0],
            g_rot[..., 1],
            g_rot[..., 2],
            g_tx,
            g_ty,
            g_tz,
            g_x,
            g_y,
            g_z,
        ],
        axis=-1,
    )
    return error, gradient
