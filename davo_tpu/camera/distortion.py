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


def _euler_zyx_derivatives(rx, ry, rz):
    """``(dR/drx, dR/dry, dR/drz)`` for :func:`_euler_zyx_matrix`."""
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    zero = jnp.zeros_like(sx)

    def mat(rows):
        return jnp.stack(
            [jnp.stack(r, axis=-1) for r in rows], axis=-2
        )

    d_rx = mat([
        [zero, cx * sy * cz + sx * sz, -sx * sy * cz + cx * sz],
        [zero, cx * sy * sz - sx * cz, -sx * sy * sz - cx * cz],
        [zero, cx * cy, -sx * cy],
    ])
    d_ry = mat([
        [-sy * cz, sx * cy * cz, cx * cy * cz],
        [-sy * sz, sx * cy * sz, cx * cy * sz],
        [-cy, -sx * sy, -cx * sy],
    ])
    d_rz = mat([
        [-cy * sz, -sx * sy * sz - cx * cz, -cx * sy * sz + sx * cz],
        [cy * cz, sx * sy * cz - cx * sz, cx * sy * cz + sx * sz],
        [zero, zero, zero],
    ])
    return d_rx, d_ry, d_rz


@full_f32_matmuls
def distorted_project_and_jacobian(
    points_3d: jax.Array, parameters: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Projection plus the closed-form batched Jacobian w.r.t. the 16
    parameters.

    Hand-assembled like the reference's 2N x 16 Jacobian
    (``camera_model/distorted_camera_model.py:114-385``) but via the
    stage chain rule instead of 32 monolithic scalar formulas: the
    intrinsics/distortion columns are written directly in the
    distorted-plane quantities, and the six pose columns share one
    2 x 3 downstream Jacobian ``d(pixels)/d(cam)``.  Measured 2.1x
    faster than the ``jacfwd`` build on TPU (0.249 vs 0.523 ms at batch
    4096 x 32 points; 16 pushed tangents re-evaluate the whole
    polynomial chain) — `artifacts/distorted_bench_r5.log` (jacfwd) vs
    `artifacts/distorted_bench_r5b.log` (closed form; full LM pipeline
    4.75 -> 5.46M LM-iters/s).
    Verified equal to ``jacfwd`` to roundoff
    (``tests/camera/test_distortion.py``).

    :return: ``(pixels, jacobian)`` with shapes ``(..., N, 2)`` and
        ``(..., N, 2, 16)``.
    """
    p = parameters[..., None, :]  # broadcast over points
    rx, ry, rz = parameters[..., RX], parameters[..., RY], parameters[..., RZ]
    rot = _euler_zyx_matrix(rx, ry, rz)
    cam = jnp.einsum("...ij,...nj->...ni", rot, points_3d)
    cam = cam + jnp.stack(
        [parameters[..., TX], parameters[..., TY], parameters[..., TZ]], -1
    )[..., None, :]
    z_raw = cam[..., 2]
    z = jnp.where(z_raw == 0.0, 1e-8, z_raw)
    # the guard's where() blocks the z tangent on the z == 0 branch;
    # mirror that so the closed form equals jacfwd exactly
    zmask = (z_raw != 0.0).astype(z.dtype)
    a = cam[..., 0] / z
    b = cam[..., 1] / z
    fx, skew, fy = p[..., FX], p[..., S], p[..., FY]
    k1, k2, k3 = p[..., K1], p[..., K2], p[..., K3]
    tp1, tp2 = p[..., P1], p[..., P2]
    u = fx * a + skew * b
    v = fy * b
    r2 = u * u + v * v
    r4 = r2 * r2
    r6 = r4 * r2
    radial = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    uv = u * v
    u_prime = u * radial + 2.0 * tp1 * uv + tp2 * (r2 + 2.0 * u * u) + p[..., CX]
    v_prime = v * radial + 2.0 * tp2 * uv + tp1 * (r2 + 2.0 * v * v) + p[..., CY]
    pixels = jnp.stack([u_prime, v_prime], axis=-1)

    # distorted-plane Jacobian d(u', v')/d(u, v) — symmetric off-diagonal
    g = k1 + 2.0 * k2 * r2 + 3.0 * k3 * r4  # d(radial)/d(r2)
    duu = radial + 2.0 * u * u * g + 2.0 * tp1 * v + 6.0 * tp2 * u
    duv = 2.0 * uv * g + 2.0 * tp1 * u + 2.0 * tp2 * v
    dvv = radial + 2.0 * v * v * g + 2.0 * tp2 * u + 6.0 * tp1 * v

    # d(u, v)/d(cam) rows (2 x 3): u, v are affine in (a, b) = cam_xy/z
    inv_z = 1.0 / z
    du_dc = (fx * inv_z, skew * inv_z, -u * inv_z * zmask)
    dv_dc = (jnp.zeros_like(v), fy * inv_z, -v * inv_z * zmask)
    # downstream 2 x 3 chain shared by all six pose columns
    jpc0 = tuple(duu * dc0 + duv * dc1 for dc0, dc1 in zip(du_dc, dv_dc))
    jpc1 = tuple(duv * dc0 + dvv * dc1 for dc0, dc1 in zip(du_dc, dv_dc))

    d_rx, d_ry, d_rz = _euler_zyx_derivatives(rx, ry, rz)
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    cols = [None] * NUM_DISTORTED_PARAMS
    cols[CX] = (ones, zeros)
    cols[CY] = (zeros, ones)
    cols[K1] = (u * r2, v * r2)
    cols[K2] = (u * r4, v * r4)
    cols[K3] = (u * r6, v * r6)
    cols[P1] = (2.0 * uv, r2 + 2.0 * v * v)
    cols[P2] = (r2 + 2.0 * u * u, 2.0 * uv)
    cols[FX] = (duu * a, duv * a)
    cols[S] = (duu * b, duv * b)
    cols[FY] = (duv * b, dvv * b)
    for idx, d_rot in ((RX, d_rx), (RY, d_ry), (RZ, d_rz)):
        dcam = jnp.einsum("...ij,...nj->...ni", d_rot, points_3d)
        cols[idx] = (
            sum(jpc0[i] * dcam[..., i] for i in range(3)),
            sum(jpc1[i] * dcam[..., i] for i in range(3)),
        )
    for axis, idx in enumerate((TX, TY, TZ)):
        cols[idx] = (jpc0[axis], jpc1[axis])

    jac = jnp.stack(
        [jnp.stack(col, axis=-1) for col in cols], axis=-1
    )  # (..., N, 2, 16)
    return pixels, jac


def distorted_project_and_jacobian_jacfwd(
    points_3d: jax.Array, parameters: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Autodiff reference for :func:`distorted_project_and_jacobian`
    (16 forward tangents through :func:`distorted_project`); kept for
    the equality tests and as the trivially-correct fallback.
    """

    def project_flat(params, pts):
        return distorted_project(pts, params)

    jac_fn = jax.jacfwd(project_flat, argnums=0)
    batch_ndim = parameters.ndim - 1
    for _ in range(batch_ndim):
        jac_fn = jax.vmap(jac_fn)
    return distorted_project(points_3d, parameters), jac_fn(parameters, points_3d)
