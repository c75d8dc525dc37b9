"""Batched BFGS with Wolfe line search, as a compiled lockstep loop.

The whole batch of independent minimisation problems advances together;
per-element convergence is tracked with an ``updating`` active-set mask and
frozen elements keep their last value (``jnp.where`` merges replace the
reference's ``masked_scatter`` / fancy indexing,
``autograd_solvers/bfgs_solver.py:80-215``).

Differentiability: two execution modes share one step function.

* ``differentiable=False`` (default in eval): a ``lax.while_loop`` with
  early exit once every element has converged; the result propagates zero
  gradient (the reference detaches when ``requires_grad`` is unset).
* ``differentiable=True`` (default in training): a bounded ``lax.scan``
  whose unrolled graph is reverse-differentiable; each step is wrapped in
  ``jax.checkpoint`` so memory stays O(P) rather than O(iterations * P).
  Matches the reference's ``create_graph=True`` unrolled backprop.

Training-mode gradient-preservation knobs are carried over from the
reference (docstring ``autograd_solvers/bfgs_solver.py:39-47``): separate
training iteration/threshold budgets, random early stopping
(``drop_path_p``), and ``return_second_last``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from davo_tpu.ops.bfgs_update import fused_bfgs_update_direction
from davo_tpu.utils import inverse_curvature
from .line_search import (
    line_search_backtracking,
    line_search_wolfe_conditions,
)

__all__ = [
    "BFGSConfig",
    "bfgs_solve",
    "update_inverse_hessian",
    "scale_initial_inverse_hessian",
]


@dataclasses.dataclass(frozen=True)
class BFGSConfig:
    """Hyper-parameters of :func:`bfgs_solve`.

    Defaults mirror the reference solver
    (``autograd_solvers/bfgs_solver.py:49-78``).
    """

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
    # Warm-start each line search from the previous iteration's accepted
    # step size (clamped to [1/16, 16]) instead of 1.  Classic BFGS
    # practice: the unit step is only correct once H has converged, so
    # early iterations otherwise spend widen/zoom probes rediscovering
    # the same scale every time.  Most elements then satisfy Wolfe at the
    # first probe and a smaller line_search_iterations cap reaches the
    # same final error with roughly half the probe evaluations (the
    # dominant cost of the headline solve — see ROADMAP's SOL analysis).
    # With the backtracking search the first candidate is seeded at
    # 2x the previous accepted step so steps can recover (backtracking
    # only ever shrinks within one search); cap it with
    # warm_start_max_alpha — Armijo-only acceptance takes the FIRST
    # passing candidate, so seeding far above the unit step accepts
    # weaker steps than alpha = 1 would give (N&W recommend starting
    # quasi-Newton searches at 1; 1.0 restores that upper bound).
    warm_start_line_search: bool = False
    warm_start_max_alpha: float = 16.0
    # "wolfe" (reference parity: strong/weak Wolfe widen+zoom machine) or
    # "backtracking" (Armijo + quadratic interpolation, value-only probes
    # — roughly half the per-probe cost and 1-2 probes typical; the
    # curvature condition is covered by the Hessian update's skip guard).
    line_search_method: str = "wolfe"
    max_step_size: Optional[float] = None
    zoom_method: str = "bisection"
    strong: bool = True
    # gen-1 extras (reference solvers/bfgs_camera_solver.py:98-111): scale
    # the search direction so its largest |component| lies within
    # [min_step_distance, max_step_distance].  None disables either bound.
    max_step_distance: Optional[float] = None
    min_step_distance: Optional[float] = None
    # Storage dtype for the (B..., P, P) inverse-Hessian loop carry; the
    # update itself always runs in the parameter dtype.  "bfloat16" halves
    # the dominant HBM traffic per iteration at large P (the H carry is
    # re-read and re-written every step) at the cost of ~3 significant
    # digits on the search direction — the Wolfe line search absorbs the
    # resulting scale error.  None stores in the parameter dtype.
    hessian_dtype: Optional[str] = None
    # Fused Pallas kernel for the inverse-Hessian update + search direction
    # (ops/bfgs_update.py): channel-major (P, P, B) carry, one HBM
    # read-modify-write per iteration.  Applies to the non-differentiable
    # (eval) path on 2-D f32 batches with B % 128 == 0 and hessian_dtype
    # None or "bfloat16" (the carry is then stored bf16 inside the kernel,
    # halving its HBM traffic; update math stays f32).  None auto-enables
    # the kernel on TPU when those hold.  The actual
    # kernel choice is deferred to lowering time (lax.platform_dependent),
    # so a solve placed on CPU under jax.default_device in a TPU-backed
    # process falls back to an equivalent jnp path instead of failing to
    # compile — pass an explicit False only to keep the batch-major carry
    # layout (best CPU performance, as bench.py's baseline does).
    fused_hessian_kernel: Optional[bool] = None

    def resolve(self, training: bool) -> tuple[int, float]:
        iterations = self.iterations
        threshold = self.error_threshold
        if training:
            if self.training_iterations is not None:
                iterations = self.training_iterations
            if self.training_error_threshold is not None:
                threshold = self.training_error_threshold
        return iterations, threshold


def scale_initial_inverse_hessian(step: jax.Array, delta_gradient: jax.Array) -> jax.Array:
    """Eq. 6.20 of Nocedal & Wright: ``H_0 = (y.s / y.y) I`` as a scale on
    the identity, guarded exactly like the reference
    (``bfgs_solver.py:217-233``): denominator floored at 1e-5, scale floored
    at 1e-4.  Returns shape ``(..., 1)``.
    """
    denominator = jnp.maximum(
        jnp.sum(jnp.square(delta_gradient), axis=-1, keepdims=True), 1e-5
    )
    scale = jnp.sum(step * delta_gradient, axis=-1, keepdims=True) / denominator
    return jnp.maximum(scale, 1e-4)


def update_inverse_hessian(
    inverse_hessian: jax.Array, step: jax.Array, delta_gradient: jax.Array
) -> jax.Array:
    """Compact 4-term BFGS inverse-Hessian update (N&W eq. 6.17):

    ``H+ = H - (H y s^T + s y^T H)/(y.s) + (1 + y^T H y/(y.s)) s s^T/(y.s)``

    Guarded by :func:`davo_tpu.utils.inverse_curvature`: where the curvature
    ``y.s`` is non-positive the whole update collapses to ``H`` (skipped)
    with zero — not NaN — gradients.  Intermediate products are ordered so
    no term scales like ``|y|^2`` or ``|s|^2`` before division (the
    reference's stability ordering, ``bfgs_solver.py:235-303``).

    :param inverse_hessian: ``(..., P, P)``.
    :param step: ``(..., P)`` parameter change ``s``.
    :param delta_gradient: ``(..., P)`` gradient change ``y``.
    """
    inv_curvature = inverse_curvature(step, delta_gradient)  # (..., 1)
    # y^T H: (..., P)
    yth = jnp.einsum("...i,...ij->...j", delta_gradient, inverse_hessian)
    y_on_c = delta_gradient * inv_curvature
    # y^T H y / (y.s): (...,)
    yhy_on_c = jnp.sum(yth * y_on_c, axis=-1)
    s_on_c = step * inv_curvature
    # (1 + y^T H y/(y.s)) * (s/(y.s)) s^T
    sst = (
        s_on_c[..., :, None]
        * step[..., None, :]
        * (1.0 + yhy_on_c)[..., None, None]
    )
    # (s/(y.s)) (y^T H)
    syth = s_on_c[..., :, None] * yth[..., None, :]
    # (H y) (s/(y.s))^T
    hy = jnp.einsum("...ij,...j->...i", inverse_hessian, delta_gradient)
    hys = hy[..., :, None] * s_on_c[..., None, :]
    return inverse_hessian + sst - syth - hys


def _value_and_grad_batched(error_function, params):
    """Per-element error and gradient for a batched objective.

    Batch elements are independent, so the VJP with a ones cotangent yields
    each element's own gradient in one pass (the analogue of the reference's
    ``autograd.grad(error.sum(), params)``).
    """
    err, pullback = jax.vjp(error_function, params)
    (grad,) = pullback(jnp.ones_like(err))
    return err, grad


def clamp_search_direction(
    search_direction: jax.Array,
    max_step_distance: Optional[float],
    min_step_distance: Optional[float],
) -> jax.Array:
    """Rescale each direction so its largest |component| lies within the
    given bounds (reference ``bfgs_camera_solver.py:98-111``) — a guard
    against extreme gradients before the inverse Hessian has converged."""
    if max_step_distance is None and min_step_distance is None:
        return search_direction
    largest = jnp.maximum(
        jnp.max(jnp.abs(search_direction), axis=-1, keepdims=True), 1e-8
    )
    scale = jnp.ones_like(largest)
    if max_step_distance is not None:
        scale = jnp.where(
            largest > max_step_distance, max_step_distance / largest, scale
        )
    if min_step_distance is not None:
        scale = jnp.where(
            largest < min_step_distance, min_step_distance / largest, scale
        )
    return jnp.maximum(scale, 1e-16) * search_direction


def bfgs_solve(
    error_function: Callable[[jax.Array], jax.Array],
    parameters: jax.Array,
    config: BFGSConfig = BFGSConfig(),
    *,
    training: bool = False,
    differentiable: Optional[bool] = None,
    key: Optional[jax.Array] = None,
    value_and_grad_fn=None,
    direction_fn=None,
) -> jax.Array:
    """Minimise ``error_function`` independently for every batch element.

    :param error_function: maps ``(B..., P) -> (B...,)``; each output must
        depend only on its own parameter row.
    :param parameters: ``(B..., P)`` initial iterates.
    :param config: solver hyper-parameters.
    :param training: selects the training iteration/threshold budget and
        enables drop-path / return_second_last.
    :param differentiable: make the solve reverse-differentiable (bounded
        ``scan`` + rematerialisation).  Defaults to ``training`` — the JAX
        analogue of the reference's ``create_graph = requires_grad``.
    :param key: PRNG key, required when ``training`` and
        ``config.drop_path_p > 0``.
    :param value_and_grad_fn: optional ``params -> (error, gradient)``
        overriding autodiff — the gen-1 analytic-gradient path (objectives
        like :func:`davo_tpu.camera.ba_error_and_gradient`).
    :param direction_fn: optional learned search-direction modifier
        ``(direction, params, error, step_idx) -> direction`` (the gen-1
        ``IModifySearchDirections`` hook,
        ``solvers/search_direction_networks/i_modify_search_directions.py``).
    :return: ``(B..., P)`` optimised parameters.
    """
    if config.line_search_method not in ("wolfe", "backtracking"):
        raise ValueError(
            f"unknown line_search_method {config.line_search_method!r}"
        )
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
    h_dtype = jnp.dtype(config.hessian_dtype) if config.hessian_dtype else dtype

    fusable = (
        not differentiable
        and parameters.ndim == 2
        and config.hessian_dtype in (None, "bfloat16")
        and dtype == jnp.float32
        and parameters.shape[0] % 128 == 0
    )
    use_fused = config.fused_hessian_kernel
    if use_fused is None:
        use_fused = fusable and jax.devices()[0].platform == "tpu"
    elif use_fused and not fusable:
        raise ValueError(
            "fused_hessian_kernel requires the non-differentiable path, a "
            "2-D float32 batch with B % 128 == 0, and hessian_dtype=None"
        )

    def init_carry(params):
        p = params.shape[-1]
        if use_fused:
            # channel-major carry (P, P, B): batch fills the 128-wide lanes
            inverse_hessian = jnp.broadcast_to(
                jnp.eye(p, dtype=h_dtype)[:, :, None],
                (p, p, params.shape[0]),
            )
        else:
            inverse_hessian = jnp.broadcast_to(
                jnp.eye(p, dtype=h_dtype), batch_shape + (p, p)
            )
        carry = dict(
            params=params,
            error=jnp.zeros(batch_shape, dtype=dtype),
            gradient=jnp.zeros_like(params),
            inverse_hessian=inverse_hessian,
            step=jnp.zeros_like(params),
            updating=jnp.ones(batch_shape, dtype=bool),
            step_idx=jnp.zeros((), dtype=jnp.int32),
            key=key,
        )
        if config.warm_start_line_search:
            carry["alpha"] = jnp.ones(batch_shape, dtype=dtype)
        return carry

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

        # Full-width evaluation: frozen elements recompute their (unchanged)
        # error/gradient, which keeps the loop shape-static for XLA.
        if value_and_grad_fn is not None:
            error, gradient = value_and_grad_fn(params)
        else:
            error, gradient = _value_and_grad_batched(error_function, params)
        updating = updating & (error > threshold)

        # --- search direction -------------------------------------------
        is_first = step_idx == 0
        is_second = step_idx == 1
        delta_gradient = gradient - prev_gradient
        if use_fused:
            # One HBM read-modify-write over the (P, P, B) carry: rescale,
            # guarded rank-2 update, active-set merge, and -H grad fused
            # (ops/bfgs_update.py).
            inverse_hessian, search_direction = fused_bfgs_update_direction(
                carry["inverse_hessian"],
                carry["step"],
                delta_gradient,
                gradient,
                updating,
                is_first,
                is_second,
            )
        else:
            # The (B..., P, P) carry may be stored reduced-precision
            # (config.hessian_dtype); the update math always runs in the
            # parameter dtype — the up-cast fuses into the first use.
            inverse_hessian = carry["inverse_hessian"].astype(dtype)
            rescale = scale_initial_inverse_hessian(
                carry["step"], delta_gradient
            )
            inverse_hessian = jnp.where(
                is_second, rescale[..., None] * inverse_hessian, inverse_hessian
            )
            updated_hessian = update_inverse_hessian(
                inverse_hessian, carry["step"], delta_gradient
            )
            updated_hessian = jnp.where(
                is_first, inverse_hessian, updated_hessian
            )
            inverse_hessian = jnp.where(
                updating[..., None, None], updated_hessian, inverse_hessian
            )
            newton_direction = -jnp.einsum(
                "...ij,...j->...i", inverse_hessian, gradient
            )
            search_direction = jnp.where(is_first, -gradient, newton_direction)
        search_direction = clamp_search_direction(
            search_direction, config.max_step_distance, config.min_step_distance
        )
        if direction_fn is not None:
            search_direction = direction_fn(
                search_direction, params, error, step_idx
            )

        # --- line search + step -----------------------------------------
        init_alpha = None
        if config.warm_start_line_search:
            init_alpha = jnp.clip(carry["alpha"], 1.0 / 16.0, 16.0)
            if config.line_search_method == "backtracking":
                # backtracking only ever shrinks from its first candidate,
                # so seed at 2x the previous accepted step (capped) or the
                # accepted steps could only ratchet downwards
                init_alpha = jnp.minimum(
                    2.0 * init_alpha, config.warm_start_max_alpha
                )
        if config.line_search_method == "backtracking":
            alpha = line_search_backtracking(
                params,
                search_direction,
                error,
                gradient,
                error_function,
                sufficient_decrease=config.sufficient_decrease,
                max_iterations=config.line_search_iterations,
                active=updating,
                init_alpha=init_alpha,
            )
        else:
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
                init_alpha=init_alpha,
            )
        new_step = alpha[..., None] * search_direction
        stepped_params = params + new_step
        step = jnp.where(updating[..., None], new_step, carry["step"])

        if training and config.return_second_last:
            # Commit the step only for elements that keep updating, so the
            # returned value lags the converged iterate by one step.
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

        out = dict(
            params=params,
            error=error,
            gradient=gradient,
            inverse_hessian=inverse_hessian.astype(h_dtype),
            step=step,
            updating=updating,
            step_idx=step_idx + 1,
            key=next_key,
        )
        if config.warm_start_line_search:
            # carry the accepted step size forward; failed searches
            # (alpha 0) fall back to the unit step
            out["alpha"] = jnp.where(
                updating & (alpha > 0), alpha, carry["alpha"]
            )
        return out

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
