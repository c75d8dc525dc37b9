"""Batched limited-memory BFGS (L-BFGS) with Wolfe line search.

A beyond-reference solver (the reference implements only full BFGS,
``autograd_solvers/bfgs_solver.py``): instead of carrying the dense
``(B, P, P)`` inverse Hessian — whose HBM read-modify-write dominates the
solve even with the fused Pallas kernel (ops/bfgs_update.py) — L-BFGS
keeps the last ``m`` ``(s, y)`` pairs and reconstructs ``-H grad`` with
the standard two-loop recursion (Nocedal & Wright alg. 7.4).  Per
iteration traffic drops from O(B P^2) to O(m B P), which is also what
makes large-P bundle-adjustment objectives tractable: at P = 384 the
dense carry is 9.7 GB-per-64k-batch, the history is 15 MB per pair.

Batching semantics mirror :func:`davo_tpu.solve.bfgs.bfgs_solve` exactly:
lockstep full-width iterations, boolean ``updating`` active set with
``jnp.where`` merges, convergence on ``error <= threshold`` or step norm
below ``minimum_step``, drop-path / training budgets / return_second_last
knobs, the same Wolfe line search, and the same differentiability contract
(bounded ``scan`` + remat when differentiable, zero-gradient
``custom_jvp`` wrapper on the eval ``while_loop``).

History slots of frozen or skipped (non-positive curvature) pairs carry
``rho = 0`` so the two-loop recursion treats them as identity factors —
the L-BFGS analogue of the reference's update-skip guard
(``utils/func_inverse_curvature.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .bfgs import clamp_search_direction, _value_and_grad_batched
from .line_search import line_search_wolfe_conditions

__all__ = ["LBFGSConfig", "lbfgs_solve"]


@dataclasses.dataclass(frozen=True)
class LBFGSConfig:
    """Hyper-parameters of :func:`lbfgs_solve`; line-search and stopping
    fields have the same meaning as :class:`davo_tpu.solve.BFGSConfig`."""

    history: int = 10
    sufficient_decrease: float = 1e-4
    curvature: float = 0.9
    error_threshold: float = 1e-4
    iterations: int = 1000
    minimum_step: float = 1e-8
    drop_path_p: float = 0.1
    return_second_last: bool = False
    training_iterations: Optional[int] = None
    training_error_threshold: Optional[float] = None
    line_search_iterations: int = 1000
    max_step_size: Optional[float] = None
    zoom_method: str = "bisection"
    strong: bool = True
    max_step_distance: Optional[float] = None
    min_step_distance: Optional[float] = None

    def resolve(self, training: bool) -> tuple[int, float]:
        iterations = self.iterations
        threshold = self.error_threshold
        if training:
            if self.training_iterations is not None:
                iterations = self.training_iterations
            if self.training_error_threshold is not None:
                threshold = self.training_error_threshold
        return iterations, threshold


def _two_loop_direction(
    gradient: jax.Array,
    s_hist: jax.Array,
    y_hist: jax.Array,
    rho_hist: jax.Array,
    gamma: jax.Array,
    history: int,
) -> jax.Array:
    """``-H grad`` via the two-loop recursion over shift-ordered history.

    :param gradient: ``(B..., P)``.
    :param s_hist / y_hist: ``(m, B..., P)``, oldest pair at index 0,
        newest at ``m - 1``.
    :param rho_hist: ``(m, B...)`` — ``1/(y.s)`` or 0 for empty/skipped
        slots (identity factor).
    :param gamma: ``(B..., 1)`` initial-Hessian scale (eq. 6.20 estimate).
    """
    q = gradient
    alphas = []
    # newest-to-oldest: static unroll over the (small) history length.
    # The history is shift-ordered (newest pair at index m-1, oldest at 0),
    # so slot order IS write-time order; rho = 0 slots (empty, skipped, or
    # frozen) are identity factors and drop out of the recursion.
    for i in range(history - 1, -1, -1):
        alpha = rho_hist[i] * jnp.sum(s_hist[i] * q, axis=-1)  # (B...,)
        q = q - alpha[..., None] * y_hist[i]
        alphas.append(alpha)
    q = gamma * q
    for i in range(history):
        beta = rho_hist[i] * jnp.sum(y_hist[i] * q, axis=-1)
        q = q + (alphas[history - 1 - i] - beta)[..., None] * s_hist[i]
    return -q


def lbfgs_solve(
    error_function: Callable[[jax.Array], jax.Array],
    parameters: jax.Array,
    config: LBFGSConfig = LBFGSConfig(),
    *,
    training: bool = False,
    differentiable: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    value_and_grad_fn=None,
    direction_fn=None,
) -> jax.Array:
    """Minimise ``error_function`` independently per batch element with
    limited-memory BFGS; same contract as :func:`davo_tpu.solve.bfgs_solve`.
    """
    if differentiable is None:
        differentiable = training
    iterations, threshold = config.resolve(training)
    use_drop_path = training and config.drop_path_p > 0.0
    if use_drop_path and key is None:
        raise ValueError("drop_path_p > 0 in training mode requires a PRNG key")
    if key is None:
        key = jax.random.key(0)

    batch_shape = parameters.shape[:-1]
    dtype = parameters.dtype
    m = config.history

    def init_carry(params):
        return dict(
            params=params,
            error=jnp.zeros(batch_shape, dtype=dtype),
            gradient=jnp.zeros_like(params),
            s_hist=jnp.zeros((m,) + params.shape, dtype=dtype),
            y_hist=jnp.zeros((m,) + params.shape, dtype=dtype),
            rho_hist=jnp.zeros((m,) + batch_shape, dtype=dtype),
            step=jnp.zeros_like(params),
            gamma=jnp.ones(batch_shape + (1,), dtype=dtype),
            updating=jnp.ones(batch_shape, dtype=bool),
            step_idx=jnp.zeros((), dtype=jnp.int32),
            key=key,
        )

    def solver_step(carry):
        params = carry["params"]
        updating = carry["updating"]
        step_idx = carry["step_idx"]
        prev_gradient = carry["gradient"]

        if use_drop_path:
            subkey, next_key = jax.random.split(carry["key"])
            keep = (
                jax.random.uniform(subkey, batch_shape, dtype=jnp.float32)
                > config.drop_path_p
            )
            updating = updating & keep
        else:
            next_key = carry["key"]

        if value_and_grad_fn is not None:
            error, gradient = value_and_grad_fn(params)
        else:
            error, gradient = _value_and_grad_batched(error_function, params)
        updating = updating & (error > threshold)

        # --- history update with the pair from the previous step ---------
        is_first = step_idx == 0
        delta_gradient = gradient - prev_gradient
        curvature_val = jnp.sum(carry["step"] * delta_gradient, axis=-1)
        pair_valid = (curvature_val > 0.0) & jnp.logical_not(is_first) & updating
        rho_new = jnp.where(
            pair_valid,
            1.0 / jnp.where(pair_valid, curvature_val, 1.0),
            0.0,
        )
        # Shift-ordered history: newest pair at index m-1.  A skipped or
        # frozen element still shifts (lockstep batches cannot keep
        # per-element ring offsets) — it contributes a rho = 0 identity
        # slot, slightly shortening that element's effective memory, which
        # is the batched analogue of the reference's update-skip guard.
        write = pair_valid[..., None]
        s_hist = jnp.concatenate(
            [carry["s_hist"][1:], jnp.where(write, carry["step"], 0.0)[None]],
            axis=0,
        )
        y_hist = jnp.concatenate(
            [carry["y_hist"][1:], jnp.where(write, delta_gradient, 0.0)[None]],
            axis=0,
        )
        rho_hist = jnp.concatenate(
            [carry["rho_hist"][1:], rho_new[None]], axis=0
        )
        # gamma = (s.y)/(y.y) of the latest valid pair (eq. 6.20), with the
        # reference's guards (denominator floor 1e-5, scale floor 1e-4);
        # kept from the previous step where the new pair was skipped.
        y_sq = jnp.maximum(
            jnp.sum(jnp.square(delta_gradient), axis=-1, keepdims=True), 1e-5
        )
        gamma_new = jnp.maximum(curvature_val[..., None] / y_sq, 1e-4)
        gamma = jnp.where(pair_valid[..., None], gamma_new, carry["gamma"])

        # --- search direction --------------------------------------------
        direction = _two_loop_direction(
            gradient, s_hist, y_hist, rho_hist, gamma, m
        )
        search_direction = jnp.where(is_first, -gradient, direction)
        search_direction = clamp_search_direction(
            search_direction, config.max_step_distance, config.min_step_distance
        )
        if direction_fn is not None:
            search_direction = direction_fn(
                search_direction, params, error, step_idx
            )

        # --- line search + step ------------------------------------------
        alpha = line_search_wolfe_conditions(
            params,
            search_direction,
            error,
            gradient,
            error_function,
            sufficient_decrease=config.sufficient_decrease,
            curvature=config.curvature,
            strong=config.strong,
            max_iterations=config.line_search_iterations,
            max_step_size=config.max_step_size,
            zoom_method=config.zoom_method,
            active=updating,
        )
        new_step = alpha[..., None] * search_direction
        stepped_params = params + new_step
        step = jnp.where(updating[..., None], new_step, carry["step"])

        if training and config.return_second_last:
            still_moving = updating & (
                jnp.linalg.norm(step, axis=-1) > config.minimum_step
            )
            params = jnp.where(still_moving[..., None], stepped_params, params)
            updating = still_moving
        else:
            params = jnp.where(updating[..., None], stepped_params, params)
            updating = updating & (
                jnp.linalg.norm(step, axis=-1) > config.minimum_step
            )

        return dict(
            params=params,
            error=error,
            gradient=gradient,
            s_hist=s_hist,
            y_hist=y_hist,
            rho_hist=rho_hist,
            step=step,
            gamma=gamma,
            updating=updating,
            step_idx=step_idx + 1,
            key=next_key,
        )

    if differentiable:
        step_fn = jax.checkpoint(solver_step)

        def scan_body(carry, _):
            return step_fn(carry), None

        final, _ = jax.lax.scan(
            scan_body, init_carry(parameters), None, length=iterations
        )
        return final["params"]

    def _solve_eval(params):
        def cond(carry):
            return jnp.logical_and(
                carry["step_idx"] < iterations, jnp.any(carry["updating"])
            )

        final = jax.lax.while_loop(cond, solver_step, init_carry(params))
        return final["params"]

    solve_eval = jax.custom_jvp(_solve_eval)

    @solve_eval.defjvp
    def _solve_eval_jvp(primals, tangents):
        out = _solve_eval(*primals)
        return out, jnp.zeros_like(out)

    return solve_eval(jax.lax.stop_gradient(parameters))
