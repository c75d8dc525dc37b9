"""Differentiable SO(3) via the axis-angle (so(3) vector) chart.

All functions are pure, broadcast over arbitrary leading batch dimensions,
and are built on the stable ``sinc``-family primitives *parameterised by the
squared angle* ``s = |w|^2``.  Because every trig ratio in Rodrigues'
formula is an even function of the angle, working in ``s`` avoids the
``sqrt(0)`` non-differentiability entirely: rotation values and derivatives
of any order are finite at the identity.

With ``s = |w|^2`` and the stable ratios (see ``davo_tpu.utils.stable_trig``)

* ``f1(s) = sin(x)/x``            with ``x = sqrt(s)``
* ``f4(s) = (1 - cos(x))/x^2``
* ``f2(s) = cos(x)/x^2 - sin(x)/x^3``
* ``f3(s) = sin(x)/x^3 - 2(1-cos(x))/x^4``

Rodrigues' formula for an *unnormalised* axis ``w`` is

    R(w) v = v cos(x) + f4 (w . v) w + f1 (w x v)

Feature parity target: ``geometry/lie_rotation.py`` and
``geometry/axis_angle_rotation.py`` in the reference repo (the class's lazy
caches are unnecessary under XLA — common subexpressions are eliminated by
the compiler).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from davo_tpu.utils.stable_trig import (
    sinc_sq,
    one_minus_cos_sq,
    cos_sin_sq,
    sin_cubed_sq,
    cos_from_sq,
)

__all__ = [
    "rotate_vector_axis_angle",
    "so3_rotation_matrix",
    "so3_parameter_jacobian",
    "so3_vector_jacobian",
    "axis_angle_from_quaternion",
    "quaternion_from_matrix",
    "axis_angle_from_matrix",
    "wrap_axis_angle",
    "skew_matrix",
]


def _angle_sq(axis_angle: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(axis_angle), axis=-1, keepdims=True)


def rotate_vector_axis_angle(vector: jax.Array, axis_angle: jax.Array) -> jax.Array:
    """Rotate 3-vectors by axis-angle rotations (Rodrigues), broadcasting
    over leading batch dimensions.

    :param vector: ``(..., 3)`` vectors to rotate.
    :param axis_angle: ``(..., 3)`` so(3) vectors; direction is the rotation
        axis, norm is the rotation angle in radians.
    """
    s = _angle_sq(axis_angle)
    cos_theta = cos_from_sq(s)
    f1 = sinc_sq(s)
    f4 = one_minus_cos_sq(s)
    dot = jnp.sum(vector * axis_angle, axis=-1, keepdims=True)
    cross = jnp.cross(axis_angle, vector)
    return vector * cos_theta + f4 * dot * axis_angle + f1 * cross


def skew_matrix(w: jax.Array) -> jax.Array:
    """``[w]_x`` such that ``[w]_x v = w x v``; shape ``(..., 3, 3)``."""
    x, y, z = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_rotation_matrix(axis_angle: jax.Array) -> jax.Array:
    """The rotation matrix ``R(w) = cos(x) I + f4 w w^T + f1 [w]_x``.

    Since ``R(w) v`` is linear in ``v`` this is also the Jacobian
    ``d(R v)/dv`` (reference ``LieRotation.vector_gradient``,
    ``geometry/lie_rotation.py:129-172``).
    """
    s = _angle_sq(axis_angle)[..., None]
    cos_theta = cos_from_sq(s)
    f1 = sinc_sq(s)
    f4 = one_minus_cos_sq(s)
    eye = jnp.eye(3, dtype=axis_angle.dtype)
    outer = axis_angle[..., :, None] * axis_angle[..., None, :]
    return cos_theta * eye + f4 * outer + f1 * skew_matrix(axis_angle)


so3_vector_jacobian = so3_rotation_matrix


def so3_parameter_jacobian(vector: jax.Array, axis_angle: jax.Array) -> jax.Array:
    """Analytic Jacobian ``d(R(w) v)/dw``, shape ``(..., 3, 3)``.

    Layout: ``J[..., i, j] = d (R v)_i / d w_j`` (rows are rotated-vector
    coordinates, columns are so(3) parameters), matching the reference's
    ``LieRotation.parameter_gradient`` (``geometry/lie_rotation.py:51-127``).

    Derivation (x = |w|, d x/d w_j = w_j / x):

        J_ij = -v_i w_j f1                              (from v cos x)
             + (w.v) f3 w_i w_j + f4 (w_i v_j + (w.v) delta_ij)
                                                         (from f4 (w.v) w)
             + f2 w_j (w x v)_i + f1 eps_ijk v_k        (from f1 (w x v))
    """
    s = _angle_sq(axis_angle)
    f1 = sinc_sq(s)
    f4 = one_minus_cos_sq(s)
    f2 = cos_sin_sq(s)
    f3 = sin_cubed_sq(s)

    dot = jnp.sum(vector * axis_angle, axis=-1, keepdims=True)
    cross = jnp.cross(axis_angle, vector)

    w_i = axis_angle[..., :, None]  # row (coordinate) broadcast
    w_j = axis_angle[..., None, :]  # column (parameter) broadcast
    v_i = vector[..., :, None]
    v_j = vector[..., None, :]
    cross_i = cross[..., :, None]
    eye = jnp.eye(3, dtype=vector.dtype)

    f1e = f1[..., None]
    f2e = f2[..., None]
    f3e = f3[..., None]
    f4e = f4[..., None]
    dote = dot[..., None]

    term_cos = -v_i * w_j * f1e
    term_dot = dote * f3e * w_i * w_j + f4e * (w_i * v_j + dote * eye)
    # eps_ijk v_k is the negated skew of v: rows [0, vz, -vy], [-vz, 0, vx], ...
    term_cross = f2e * w_j * cross_i - f1e * skew_matrix(vector)
    return term_cos + term_dot + term_cross


def axis_angle_from_quaternion(quaternion: jax.Array) -> jax.Array:
    """Convert WXYZ quaternions to axis-angle so(3) vectors.

    Not assumed normalised.  Reference: ``LieRotation.from_quaternion``
    (``geometry/lie_rotation.py:211-227``).
    """
    scalar = quaternion[..., 0:1]
    vector = quaternion[..., 1:4]
    vector_norm = jnp.linalg.norm(vector, axis=-1, keepdims=True)
    half_angle = jnp.arctan2(vector_norm, scalar)
    sin_half = jnp.sin(half_angle)
    nonzero = sin_half != 0.0
    scale = jnp.where(
        nonzero, 2.0 * half_angle / jnp.where(nonzero, sin_half, 1.0), 0.0
    )
    return scale * vector


def quaternion_from_matrix(matrix: jax.Array) -> jax.Array:
    """Convert rotation matrices to WXYZ quaternions (w >= 0).

    Branch-free variant of Shepperd's method: computes all four candidate
    quaternions (one per largest component) and selects with ``where`` — the
    TPU-native replacement for the reference's host-side
    ``transforms3d.mat2axangle`` round-trip
    (``data/camera_and_parameters_dataset.py:96-145``).
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each numerically stable when its pivot is largest.
    # w-pivot
    sw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    qw = jnp.stack(
        [0.25 * sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw],
        axis=-1,
    )
    # x-pivot
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = jnp.stack(
        [(m21 - m12) / sx, 0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx],
        axis=-1,
    )
    # y-pivot
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = jnp.stack(
        [(m02 - m20) / sy, (m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy],
        axis=-1,
    )
    # z-pivot
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = jnp.stack(
        [(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz],
        axis=-1,
    )

    cond_w = (tr > m00) & (tr > m11) & (tr > m22)
    cond_x = (m00 >= m11) & (m00 >= m22)
    cond_y = m11 >= m22
    q = jnp.where(
        cond_w[..., None],
        qw,
        jnp.where(cond_x[..., None], qx, jnp.where(cond_y[..., None], qy, qz)),
    )
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.where(q[..., 0:1] < 0.0, -q, q)


def axis_angle_from_matrix(matrix: jax.Array) -> jax.Array:
    """Rotation matrix -> so(3) vector (via quaternions, branch-free)."""
    return axis_angle_from_quaternion(quaternion_from_matrix(matrix))


def wrap_axis_angle(axis_angle: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Re-express an axis-angle vector with angle wrapped into [-pi, pi].

    Reference: ``LieRotation.add_lie_parameters(constrain=True)``
    (``geometry/lie_rotation.py:181-190``).
    """
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    axis = axis_angle / jnp.maximum(angle, eps)
    wrapped = jnp.mod(angle + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    return wrapped * axis
