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
    "spd_solve_small",
]


def spd_solve_small(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD solve for small P via an UNROLLED Cholesky in plain jnp.

    TPU lowers ``lax.linalg.cholesky`` / ``triangular_solve`` to custom
    calls whose internal blocked matmuls run at the hardware default
    (bf16 passes) — outside ``jax.default_matmul_precision``'s reach —
    which loses the conditioning small mixed-unit normal equations need
    (measured: 16-param distorted-camera recovery 1.3e-2 mean parameter
    error through the custom calls vs 1e-6 on CPU LAPACK).  This
    column-unrolled factorisation + substitution is built from ordinary
    jnp ops, so every product respects the ambient precision context.
    Cost is O(P^3) elementwise work fully parallel over the batch —
    the right trade for the P <= ~48 systems this solver targets.

    The system is symmetrically Jacobi-scaled first (unit diagonal),
    so badly-scaled parameter blocks factor accurately in f32.

    :param a: ``(..., P, P)`` SPD matrices.
    :param b: ``(..., P)`` right-hand sides.
    :return: ``(..., P)`` solutions.
    """
    p = a.shape[-1]
    d = jnp.sqrt(
        jnp.maximum(jnp.diagonal(a, axis1=-2, axis2=-1), 1e-30)
    )
    a = a / (d[..., :, None] * d[..., None, :])
    b = b / d
    # column-by-column Cholesky (static unroll over the P columns)
    l_cols = []
    for j in range(p):
        col = a[..., :, j]
        for k in range(j):
            col = col - l_cols[k] * l_cols[k][..., j : j + 1]
        piv = jnp.sqrt(jnp.maximum(col[..., j : j + 1], 1e-30))
        col = col / piv
        # zero the upper part so later updates stay consistent
        mask = jnp.arange(p) >= j
        col = jnp.where(mask, col, 0.0)
        l_cols.append(col)
    # forward substitution L y = b
    y = []
    for i in range(p):
        acc = b[..., i]
        for k in range(i):
            acc = acc - l_cols[k][..., i] * y[k]
        y.append(acc / l_cols[i][..., i])
    # back substitution L^T x = y
    x = [None] * p
    for i in reversed(range(p)):
        acc = y[i]
        for k in range(i + 1, p):
            acc = acc - l_cols[i][..., k] * x[k]
        x[i] = acc / l_cols[i][..., i]
    x = jnp.stack(x, axis=-1)

    def substitute(rhs):
        yy = []
        for i in range(p):
            acc = rhs[..., i]
            for k in range(i):
                acc = acc - l_cols[k][..., i] * yy[k]
            yy.append(acc / l_cols[i][..., i])
        xx = [None] * p
        for i in reversed(range(p)):
            acc = yy[i]
            for k in range(i + 1, p):
                acc = acc - l_cols[i][..., k] * xx[k]
            xx[i] = acc / l_cols[i][..., i]
        return jnp.stack(xx, axis=-1)

    # two rounds of iterative refinement: at the conditioning of damped
    # mixed-unit normal equations (~1e10+ before scaling) a single f32
    # factorisation loses several digits; refining against the residual
    # recovers them for the cost of two matvecs + substitutions
    for _ in range(2):
        resid = b - jnp.einsum("...ij,...j->...i", a, x)
        x = x + substitute(resid)
    return x / d


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
        # aug is SPD by construction (J^T J + lambda I, lambda > 0)
        step = -spd_solve_small(aug, jtr)
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
