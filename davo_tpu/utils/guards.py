"""Guarded numeric primitives used inside the solvers.

Each guard has a value-level branch (to avoid inf/NaN) *and* a matching
derivative rule so that no NaN leaks into gradients through the unused
branch.  Feature parity targets in the reference repo:
``utils/func_inverse_curvature.py``, ``utils/func_interpolate_alpha.py``,
``utils/func_project_vector_onto_axis.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "safe_reciprocal",
    "safe_norm",
    "inverse_curvature",
    "interpolate_alpha",
    "project_vector_onto_axis",
    "straight_through_max",
]


@jax.custom_jvp
def safe_reciprocal(x):
    """``1/x`` but exactly 0 where ``x == 0`` (value and all derivatives)."""
    nonzero = x != 0.0
    return jnp.where(nonzero, 1.0 / jnp.where(nonzero, x, 1.0), 0.0)


@safe_reciprocal.defjvp
def _safe_reciprocal_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    r = safe_reciprocal(x)
    return r, -t * r * r


@jax.custom_jvp
def _safe_norm_last(x):
    """L2 norm over the last axis (keepdims) whose derivative is the unit
    vector away from 0 and exactly **zero at 0** (the subgradient choice).

    ``jnp.linalg.norm`` yields NaN cotangents at the origin — fatal when a
    distance objective reaches an exact zero residual (every perfectly
    matched observation then poisons the whole batch gradient).
    """
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


@_safe_norm_last.defjvp
def _safe_norm_last_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    norm = _safe_norm_last(x)
    nonzero = norm > 0.0
    inv = jnp.where(nonzero, 1.0 / jnp.where(nonzero, norm, 1.0), 0.0)
    return norm, jnp.sum(x * t, axis=-1, keepdims=True) * inv


def safe_norm(x, axis: int = -1, keepdims: bool = False):
    """Gradient-safe L2 norm (zero derivative at the origin)."""
    if axis != -1:
        x = jnp.moveaxis(x, axis, -1)
    out = _safe_norm_last(x)
    if not keepdims:
        out = out[..., 0]
    return out


def guarded_sqrt(squared):
    """``sqrt`` of a sum-of-squares with a zero derivative at zero — the
    structure-of-arrays companion of :func:`safe_norm` (double-where
    pattern) for callers that carry vector components as separate arrays.
    """
    positive = squared > 0.0
    return jnp.where(
        positive, jnp.sqrt(jnp.where(positive, squared, 1.0)), 0.0
    )


@jax.custom_jvp
def inverse_curvature(step, delta_gradient):
    """``1 / (y^T s)`` along the last axis, zeroed where the curvature is
    non-positive so a BFGS Hessian update is silently skipped.

    Returns shape ``(..., 1)``.  The derivative treats the zeroed entries as
    constant zero (no NaN cotangents), matching the reference's custom
    backward (``utils/func_inverse_curvature.py:39-51``).
    """
    curvature = jnp.sum(step * delta_gradient, axis=-1, keepdims=True)
    positive = curvature > 0.0
    return jnp.where(
        positive, 1.0 / jnp.where(positive, curvature, 1.0), 0.0
    )


@inverse_curvature.defjvp
def _inverse_curvature_jvp(primals, tangents):
    step, delta_gradient = primals
    t_step, t_dg = tangents
    inv = inverse_curvature(step, delta_gradient)
    d_curv = jnp.sum(
        t_step * delta_gradient + step * t_dg, axis=-1, keepdims=True
    )
    return inv, -inv * inv * d_curv


@jax.custom_jvp
def interpolate_alpha(alpha_1, alpha_2, value_1, value_2):
    """Pick a new candidate step size between ``alpha_1`` and ``alpha_2``.

    Linearly interpolates the zero crossing of the values (secant step); falls
    back to bisection when the values are equal or the secant lands within
    1e-3 of either bound.  Differentiable w.r.t. all four inputs; the
    bisection branch propagates 0.5 to each alpha and zero to the values
    (reference: ``utils/func_interpolate_alpha.py``).
    """
    secant, bisect, use_bisection, _ = _interpolate_alpha_parts(
        alpha_1, alpha_2, value_1, value_2
    )
    return jnp.where(use_bisection, bisect, secant)


def _interpolate_alpha_parts(alpha_1, alpha_2, value_1, value_2):
    value_diff = value_2 - value_1
    degenerate = value_diff == 0.0
    inv_diff = jnp.where(
        degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, value_diff)
    )
    secant = alpha_1 - value_1 * (alpha_2 - alpha_1) * inv_diff
    min_alpha = jnp.minimum(alpha_1, alpha_2)
    max_alpha = jnp.maximum(alpha_1, alpha_2)
    use_bisection = (
        degenerate
        | (secant < min_alpha + 1e-3)
        | (secant > max_alpha - 1e-3)
    )
    bisect = 0.5 * (alpha_1 + alpha_2)
    return secant, bisect, use_bisection, inv_diff


@interpolate_alpha.defjvp
def _interpolate_alpha_jvp(primals, tangents):
    alpha_1, alpha_2, value_1, value_2 = primals
    t_a1, t_a2, t_v1, t_v2 = tangents
    secant, bisect, use_bisection, inv_diff = _interpolate_alpha_parts(
        alpha_1, alpha_2, value_1, value_2
    )
    out = jnp.where(use_bisection, bisect, secant)
    inv_gradient = (alpha_2 - alpha_1) * inv_diff
    d_secant = (
        t_a1 * value_2 * inv_diff
        - t_a2 * value_1 * inv_diff
        - t_v1 * value_2 * inv_gradient * inv_diff
        + t_v2 * value_1 * inv_gradient * inv_diff
    )
    d_bisect = 0.5 * (t_a1 + t_a2)
    return out, jnp.where(use_bisection, d_bisect, d_secant)


@jax.custom_jvp
def straight_through_max(x, floor):
    """``max(x, floor)`` whose gradient is identity in ``x`` everywhere
    (and zero in ``floor``).

    Used for the bundle-adjustment z-clamp: points clamped to the minimum
    depth must still receive depth gradients so the optimiser can pull them
    back in front of the camera — a hard ``maximum`` would zero them out
    and freeze the point forever (the reference evaluates its analytic
    gradient at the clamped value but never differentiates the clamp,
    ``camera_model/pinhole_camera_model_l1.py:446-463``).
    """
    return jnp.maximum(x, floor)


@straight_through_max.defjvp
def _straight_through_max_jvp(primals, tangents):
    x, floor = primals
    t_x, _ = tangents
    return jnp.maximum(x, floor), t_x


def project_vector_onto_axis(vector, axis, axis_square_norm=None):
    """Project ``vector`` onto ``axis`` along the last dimension:
    ``((v . a) / |a|^2) a``, returning 0 where the axis is the zero vector.

    Neither input needs to be normalised.  ``axis_square_norm`` may be
    supplied if already computed (shape ``(..., 1)``).
    """
    if axis_square_norm is None:
        axis_square_norm = jnp.sum(jnp.square(axis), axis=-1, keepdims=True)
    elif axis_square_norm.ndim < axis.ndim:
        axis_square_norm = axis_square_norm[..., None]
    dot = jnp.sum(vector * axis, axis=-1, keepdims=True)
    return dot * safe_reciprocal(axis_square_norm) * axis
