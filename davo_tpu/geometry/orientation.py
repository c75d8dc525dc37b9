"""Rotation matrices from two (un-normalised) basis vectors.

Gram–Schmidt orthonormalisation: column 1 is ``a`` normalised, column 2 is
``b`` with its component along ``a`` removed then normalised, column 3 is
their cross product.

The reference hand-derives all 45 scalar partials of the 9 matrix entries
w.r.t. the 6 inputs (``geometry/vectors_to_rotation_matrix.py:166-411``).
Here the construction is a pure function and the full Jacobian comes from
``jax.jacfwd`` — the idiomatic JAX equivalent, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from davo_tpu.utils import safe_reciprocal

__all__ = [
    "two_vector_rotation_matrix",
    "two_vector_rotation_jacobian",
]


def two_vector_rotation_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Orthonormalise ``(a, b)`` into a rotation matrix.

    :param a: ``(..., 3)`` first (forward) basis vector; becomes column 1.
    :param b: ``(..., 3)`` second (down) basis vector; its component
        orthogonal to ``a`` becomes column 2.
    :return: ``(..., 3, 3)`` rotation matrices with columns
        ``[a_hat, b'_hat, a_hat x b'_hat]``.
    """
    a_sq_len = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
    a_len = jnp.sqrt(a_sq_len)
    col_1 = a * safe_reciprocal(a_len)
    a_dot_b = jnp.sum(a * b, axis=-1, keepdims=True)
    b_prime = b - a * (a_dot_b * safe_reciprocal(a_sq_len))
    b_prime_len = jnp.sqrt(jnp.sum(jnp.square(b_prime), axis=-1, keepdims=True))
    col_2 = b_prime * safe_reciprocal(b_prime_len)
    col_3 = jnp.cross(col_1, col_2)
    return jnp.stack([col_1, col_2, col_3], axis=-1)


def two_vector_rotation_jacobian(a: jax.Array, b: jax.Array):
    """Jacobians of every rotation-matrix entry w.r.t. both input vectors.

    :return: A pair ``(dR_da, dR_db)`` of ``(..., 3, 3, 3)`` arrays where
        ``dR_da[..., i, j, k] = d R[i, j] / d a[k]`` (equivalent of the
        reference's 45 hand-derived formulas,
        ``geometry/vectors_to_rotation_matrix.py:166-411``).
    """
    jac = jax.jacfwd(two_vector_rotation_matrix, argnums=(0, 1))
    for _ in range(a.ndim - 1):
        jac = jax.vmap(jac)
    return jac(a, b)
