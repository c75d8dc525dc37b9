"""Least-squares utilities + a batched damped Gauss–Newton
(Levenberg–Marquardt) solver for Jacobian-based camera models.

Feature parity target: ``solvers/least_squares_utils.py`` in the reference
(``find_residuals`` / ``find_error`` / ``find_error_gradient``), extended
with the Gauss–Newton refinement loop the reference's distorted camera
model was designed for (``camera_model/distorted_camera_model.py:137-140``)
but never shipped.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "find_residuals",
    "find_error",
    "find_error_gradient",
    "LMConfig",
    "levenberg_marquardt",
]


def find_residuals(estimates: jax.Array, targets: jax.Array) -> jax.Array:
    """``estimate - target`` (reference ``least_squares_utils.py:4-10``)."""
    return estimates - targets


def find_error(
    residuals: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """Weighted sum of squared residuals over the final axis."""
    sq = jnp.square(residuals)
    if weights is not None:
        sq = sq * weights
    return jnp.sum(sq, axis=-1)


def find_error_gradient(
    residuals: jax.Array, jacobian: jax.Array, weights: Optional[jax.Array] = None
) -> jax.Array:
    """``2 r^T J`` reduction: gradient of the squared error w.r.t. the
    parameters.  ``residuals``: ``(..., R)``, ``jacobian``: ``(..., R, P)``.
    """
    r = residuals if weights is None else residuals * weights
    return 2.0 * jnp.einsum("...r,...rp->...p", r, jacobian)


@dataclasses.dataclass(frozen=True)
class LMConfig:
    iterations: int = 20
    initial_damping: float = 1e-3
    damping_up: float = 10.0
    damping_down: float = 0.1
    min_damping: float = 1e-9
    max_damping: float = 1e9
    error_threshold: float = 0.0


def levenberg_marquardt(
    residual_and_jacobian: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    parameters: jax.Array,
    config: LMConfig = LMConfig(),
) -> jax.Array:
    """Batched damped Gauss–Newton on ``sum(residuals^2)``.

    Every batch element carries its own damping factor and accepts/rejects
    steps independently (lockstep full-width compute, masked updates).

    :param residual_and_jacobian: maps ``(..., P)`` parameters to
        ``(..., R)`` residuals and ``(..., R, P)`` Jacobians.
    :param parameters: ``(..., P)`` initial iterates.
    """
    p = parameters.shape[-1]
    eye = jnp.eye(p, dtype=parameters.dtype)

    def error_of(params):
        res, _ = residual_and_jacobian(params)
        return jnp.sum(jnp.square(res), axis=-1)

    def body(carry, _):
        params, damping, active = carry
        res, jac = residual_and_jacobian(params)
        error = jnp.sum(jnp.square(res), axis=-1)
        jtj = jnp.einsum("...rp,...rq->...pq", jac, jac)
        jtr = jnp.einsum("...rp,...r->...p", jac, res)
        aug = jtj + damping[..., None, None] * eye
        # aug is SPD by construction (J^T J + lambda I, lambda > 0):
        # batched Cholesky beats the general LU path on TPU for the
        # small per-element systems this solver targets (P ~ 6-45)
        chol = jax.scipy.linalg.cholesky(aug, lower=True)
        step = -jax.scipy.linalg.cho_solve(
            (chol, True), jtr[..., None]
        )[..., 0]
        candidate = params + step
        new_error = error_of(candidate)
        improved = (new_error < error) & active
        params = jnp.where(improved[..., None], candidate, params)
        damping = jnp.where(
            improved, damping * config.damping_down, damping * config.damping_up
        )
        damping = jnp.clip(damping, config.min_damping, config.max_damping)
        active = active & (
            jnp.minimum(new_error, error) > config.error_threshold
        )
        return (params, damping, active), None

    batch_shape = parameters.shape[:-1]
    init = (
        parameters,
        jnp.full(batch_shape, config.initial_damping, parameters.dtype),
        jnp.ones(batch_shape, dtype=bool),
    )
    (final_params, _, _), _ = jax.lax.scan(
        body, init, None, length=config.iterations
    )
    return final_params
