"""Batched (strong) Wolfe line search as a masked lockstep state machine.

Implements algorithms 3.5 (bracketing / widening) and 3.6 (zoom) from
Nocedal & Wright, *Numerical Optimization*, vectorised over arbitrary batch
dimensions: every batch element carries ``widening`` / ``zooming`` state
bits and the whole batch advances in lockstep inside one
``lax.while_loop`` — the TPU-native replacement for the reference's
boolean-mask + fancy-indexing loop
(``autograd_solvers/line_search/wolfe_conditions.py:23-253`` and
``solvers/line_search_strong_wolfe_conditions.py``).

The returned step size is a *search result*, not a differentiable function
of the inputs, so the whole routine propagates **zero** gradient (the
reference detaches all inputs; here a ``custom_jvp`` with zero tangent
makes the routine transparent to both forward- and reverse-mode autodiff
without attempting to differentiate through the ``while_loop``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from davo_tpu.utils import interpolate_alpha

__all__ = ["line_search_wolfe_conditions", "line_search_backtracking"]


def line_search_backtracking(
    parameters: jax.Array,
    search_direction: jax.Array,
    base_error: jax.Array,
    base_gradient: jax.Array,
    error_function: Callable[[jax.Array], jax.Array],
    sufficient_decrease: float = 1e-4,
    max_iterations: int = 8,
    active: Optional[jax.Array] = None,
    init_alpha: Optional[jax.Array] = None,
) -> jax.Array:
    """Armijo backtracking with quadratic interpolation — value-only
    probes.

    The Wolfe machine's probes (:func:`line_search_wolfe_conditions`)
    evaluate ``(phi, phi')`` by forward-mode jvp, roughly twice the cost
    of the plain objective, and its widen/zoom bracket typically needs
    3-8 probes.  For quasi-Newton methods the unit step is accepted as
    soon as H approximates the local Hessian (N&W §3.5 recommends always
    trying ``alpha = 1`` first), so an Armijo-only search accepts in 1-2
    *value-only* probes for most of the batch; the curvature condition it
    drops is already enforced a posteriori by the BFGS update's
    non-positive-curvature skip guard.  Between probes the next candidate
    is the quadratic-fit minimiser clipped to ``[0.1, 0.5] * alpha``
    (N&W eq. 3.58).

    Same zero-gradient contract as the Wolfe search.

    :param init_alpha: optional ``(B...,)`` first candidate step (default
        1) — the warm-start hook :func:`line_search_wolfe_conditions` has;
        subsequent candidates backtrack from it as usual.
    :return: ``(B...,)`` accepted step sizes (0 where no candidate
        passed within the probe budget).
    """
    c1 = sufficient_decrease

    def _core(params, direction, err0, grad0, active_mask, alpha0):
        dtype = params.dtype
        batch_shape = err0.shape
        dphi0 = jnp.sum(direction * grad0, axis=-1)

        def phi(alpha):
            return error_function(params + alpha[..., None] * direction)

        init = dict(
            searching=jnp.broadcast_to(active_mask, batch_shape),
            alpha=jnp.broadcast_to(alpha0.astype(dtype), batch_shape),
            accepted=jnp.zeros(batch_shape, dtype=dtype),
            step_idx=jnp.zeros((), dtype=jnp.int32),
        )

        def cond(state):
            return jnp.logical_and(
                state["step_idx"] < max_iterations,
                jnp.any(state["searching"]),
            )

        def body(state):
            alpha = state["alpha"]
            err = phi(alpha)
            ok = err <= err0 + c1 * alpha * dphi0
            accepted = jnp.where(
                state["searching"] & ok, alpha, state["accepted"]
            )
            searching = state["searching"] & ~ok
            # quadratic through (0, phi0), (0, dphi0), (alpha, err):
            # minimiser at -dphi0 a^2 / (2 (err - phi0 - dphi0 a))
            denom = 2.0 * (err - err0 - dphi0 * alpha)
            quad = -dphi0 * jnp.square(alpha) / jnp.where(
                jnp.abs(denom) > 1e-30, denom, 1.0
            )
            next_alpha = jnp.clip(quad, 0.1 * alpha, 0.5 * alpha)
            next_alpha = jnp.where(
                jnp.isfinite(next_alpha), next_alpha, 0.5 * alpha
            )
            return dict(
                searching=searching,
                alpha=jnp.where(searching, next_alpha, alpha),
                accepted=accepted,
                step_idx=state["step_idx"] + 1,
            )

        final = jax.lax.while_loop(cond, body, init)
        return final["accepted"]

    core = jax.custom_jvp(_core)

    @core.defjvp
    def _core_jvp(primals, tangents):
        out = _core(*primals)
        return out, jnp.zeros_like(out)

    if active is None:
        active = jnp.ones(base_error.shape, dtype=bool)
    if init_alpha is None:
        init_alpha = jnp.ones(base_error.shape, dtype=parameters.dtype)
    return core(
        jax.lax.stop_gradient(parameters),
        jax.lax.stop_gradient(search_direction),
        jax.lax.stop_gradient(base_error),
        jax.lax.stop_gradient(base_gradient),
        active,
        jax.lax.stop_gradient(init_alpha),
    )


def line_search_wolfe_conditions(
    parameters: jax.Array,
    search_direction: jax.Array,
    base_error: jax.Array,
    base_gradient: jax.Array,
    error_function: Callable[[jax.Array], jax.Array],
    sufficient_decrease: float = 1e-4,
    curvature: float = 0.9,
    strong: bool = True,
    max_iterations: int = 1000,
    max_step_size: Optional[float] = None,
    zoom_method: str = "bisection",
    active: Optional[jax.Array] = None,
    init_alpha: Optional[jax.Array] = None,
) -> jax.Array:
    """Find per-batch-element step sizes satisfying the (strong) Wolfe
    conditions along ``search_direction``.

    1. ``f(x + a d) <= f(x) + c1 a d.f'(x)``  (sufficient decrease)
    2. ``-d.f'(x + a d) <= -c2 d.f'(x)``      (curvature; strong variant
       uses ``|d.f'(x + a d)| <= c2 |d.f'(x)|``)

    :param parameters: ``(B..., P)`` current iterates ``x``.
    :param search_direction: ``(B..., P)`` directions ``d``.
    :param base_error: ``(B...,)`` ``f(x)``.
    :param base_gradient: ``(B..., P)`` ``f'(x)``.
    :param error_function: maps ``(B..., P) -> (B...,)``; evaluated
        full-width at each candidate step.
    :param sufficient_decrease: Wolfe ``c1``, ``0 < c1 < c2``.
    :param curvature: Wolfe ``c2``, ``c1 < c2 < 1``.
    :param strong: apply the strong curvature condition.
    :param max_iterations: hard cap on widen+zoom iterations.
    :param max_step_size: optional cap on the widening doubling (the gen-1
        reference solver's ``max_step_size``); ``None`` leaves it unbounded.
    :param zoom_method: ``"bisection"`` (gen-2 reference behaviour) or
        ``"interpolate"`` — secant interpolation of the directional
        derivative's zero via :func:`davo_tpu.utils.interpolate_alpha`
        with bisection fallback (gen-1 behaviour).
    :param active: optional ``(B...,)`` mask; inactive elements keep step 0
        and never trigger extra loop iterations.
    :param init_alpha: optional ``(B...,)`` first candidate step (default
        1).  Warm-starting from the previous BFGS iteration's accepted
        step is classic practice (N&W §3.5: the unit step is only right
        once the Hessian estimate has converged) and lets most elements
        finish in one probe, so a smaller ``max_iterations`` cap reaches
        the same final error with roughly half the probe evaluations.
    :return: ``(B...,)`` step sizes ``a`` (zero gradient to all inputs).
    """
    if not 0.0 < sufficient_decrease < curvature < 1.0:
        raise ValueError(
            f"Line search conditions require 0 < c1 < c2 < 1; got "
            f"c1={sufficient_decrease}, c2={curvature}"
        )
    if zoom_method not in ("bisection", "interpolate"):
        raise ValueError(f"Unknown zoom_method: {zoom_method!r}")

    c1 = sufficient_decrease
    c2 = curvature

    def _core(params, direction, err0, grad0, active_mask, alpha0):
        dtype = params.dtype
        batch_shape = err0.shape
        # phi'(0) = d . f'(x)
        dphi0 = jnp.sum(direction * grad0, axis=-1)

        def phi_and_dphi(alpha):
            # phi'(alpha) is a *directional* derivative, so forward-mode
            # gives (phi, phi') in one jvp pass — cheaper than the reverse
            # pass (full gradient + dot) for the many probes the search
            # makes (the reference differentiates w.r.t. the scalar alpha
            # for the same reason, ``wolfe_conditions.py:133-143``).
            probe = params + alpha[..., None] * direction
            return jax.jvp(error_function, (probe,), (direction,))

        zeros = jnp.zeros(batch_shape, dtype=dtype)
        first_alpha = alpha0.astype(dtype)
        if max_step_size is not None:
            # the widening doublings below are capped at max_step_size;
            # a warm-started first candidate must respect the same cap
            first_alpha = jnp.minimum(
                first_alpha, jnp.asarray(max_step_size, dtype)
            )
        init = dict(
            widening=jnp.broadcast_to(active_mask, batch_shape),
            zooming=jnp.zeros(batch_shape, dtype=bool),
            lower_alpha=zeros,
            upper_alpha=zeros,
            candidate_alpha=jnp.broadcast_to(first_alpha, batch_shape),
            lower_error=err0.astype(dtype),
            upper_error=err0.astype(dtype),
            candidate_error=err0.astype(dtype),
            candidate_dphi=dphi0.astype(dtype),
            lower_dphi=dphi0.astype(dtype),
            upper_dphi=dphi0.astype(dtype),
            step_idx=jnp.zeros((), dtype=jnp.int32),
        )

        def cond(state):
            return jnp.logical_and(
                state["step_idx"] < max_iterations,
                jnp.any(state["widening"] | state["zooming"]),
            )

        def body(state):
            widening = state["widening"]
            zooming = state["zooming"]
            updating = widening | zooming
            not_first = state["step_idx"] > 0

            # --- choose the next candidate -------------------------------
            widen_adv = widening & not_first
            upper_alpha = jnp.where(
                widen_adv, state["candidate_alpha"], state["upper_alpha"]
            )
            upper_error = jnp.where(
                widen_adv, state["candidate_error"], state["upper_error"]
            )
            upper_dphi = jnp.where(
                widen_adv, state["candidate_dphi"], state["upper_dphi"]
            )
            doubled = 2.0 * state["candidate_alpha"]
            if max_step_size is not None:
                doubled = jnp.minimum(doubled, jnp.asarray(max_step_size, dtype))
            candidate_alpha = jnp.where(
                widen_adv, doubled, state["candidate_alpha"]
            )
            lower_alpha = state["lower_alpha"]
            lower_error = state["lower_error"]
            lower_dphi = state["lower_dphi"]
            if zoom_method == "bisection":
                zoom_alpha = 0.5 * (lower_alpha + upper_alpha)
            else:
                zoom_alpha = interpolate_alpha(
                    lower_alpha, upper_alpha, lower_dphi, upper_dphi
                )
            candidate_alpha = jnp.where(
                zooming & not_first, zoom_alpha, candidate_alpha
            )

            # --- evaluate the candidate ----------------------------------
            err, dphi = phi_and_dphi(candidate_alpha)
            candidate_error = jnp.where(updating, err, state["candidate_error"])
            candidate_dphi = jnp.where(updating, dphi, state["candidate_dphi"])

            # --- the three condition bits --------------------------------
            decrease = candidate_error > (
                err0 + c1 * candidate_alpha * dphi0
            )
            decrease = decrease | (zooming & (candidate_error >= lower_error))
            decrease = decrease | (
                widening & not_first & (candidate_error >= upper_error)
            )
            if strong:
                curvature_ok = jnp.abs(candidate_dphi) <= -c2 * dphi0
            else:
                curvature_ok = -candidate_dphi <= -c2 * dphi0
            grad_cond_widen = candidate_dphi >= 0.0
            grad_cond_zoom = (
                candidate_dphi * (upper_alpha - lower_alpha) >= 0.0
            )

            # --- zoom (alg 3.6) transitions ------------------------------
            set_high = zooming & decrease
            done_zoom = zooming & ~decrease & curvature_ok
            flip = zooming & ~decrease & ~curvature_ok & grad_cond_zoom
            set_low = zooming & ~decrease & ~curvature_ok

            new_upper_alpha = jnp.where(
                set_high | done_zoom, candidate_alpha, upper_alpha
            )
            new_upper_error = jnp.where(
                set_high | done_zoom, candidate_error, upper_error
            )
            new_upper_dphi = jnp.where(
                set_high | done_zoom, candidate_dphi, upper_dphi
            )
            new_upper_alpha = jnp.where(flip, lower_alpha, new_upper_alpha)
            new_upper_error = jnp.where(flip, lower_error, new_upper_error)
            new_upper_dphi = jnp.where(flip, lower_dphi, new_upper_dphi)
            new_lower_alpha = jnp.where(
                set_low | done_zoom, candidate_alpha, lower_alpha
            )
            new_lower_error = jnp.where(
                set_low | done_zoom, candidate_error, lower_error
            )
            new_lower_dphi = jnp.where(
                set_low | done_zoom, candidate_dphi, lower_dphi
            )
            zooming = zooming & ~done_zoom

            # --- widen (alg 3.5) transitions -----------------------------
            zoom_ordered = widening & decrease
            done_widen = widening & ~decrease & curvature_ok
            zoom_flipped = (
                widening & ~decrease & ~curvature_ok & grad_cond_widen
            )
            # a_lo <- a_{i-1} (held in upper_* during widening)
            new_lower_alpha = jnp.where(zoom_ordered, upper_alpha, new_lower_alpha)
            new_lower_error = jnp.where(zoom_ordered, upper_error, new_lower_error)
            new_lower_dphi = jnp.where(zoom_ordered, upper_dphi, new_lower_dphi)
            new_upper_alpha = jnp.where(
                zoom_ordered | done_widen, candidate_alpha, new_upper_alpha
            )
            new_upper_error = jnp.where(
                zoom_ordered | done_widen, candidate_error, new_upper_error
            )
            new_upper_dphi = jnp.where(
                zoom_ordered | done_widen, candidate_dphi, new_upper_dphi
            )
            new_lower_alpha = jnp.where(
                done_widen | zoom_flipped, candidate_alpha, new_lower_alpha
            )
            new_lower_error = jnp.where(
                done_widen | zoom_flipped, candidate_error, new_lower_error
            )
            new_lower_dphi = jnp.where(
                done_widen | zoom_flipped, candidate_dphi, new_lower_dphi
            )
            zooming = zooming | zoom_ordered | zoom_flipped
            # simple failure case: the bounds have collapsed
            zooming = zooming & (new_lower_alpha != new_upper_alpha)
            widening = widening & ~(zoom_ordered | done_widen | zoom_flipped)

            return dict(
                widening=widening,
                zooming=zooming,
                lower_alpha=new_lower_alpha,
                upper_alpha=new_upper_alpha,
                candidate_alpha=candidate_alpha,
                lower_error=new_lower_error,
                upper_error=new_upper_error,
                candidate_error=candidate_error,
                candidate_dphi=candidate_dphi,
                lower_dphi=new_lower_dphi,
                upper_dphi=new_upper_dphi,
                step_idx=state["step_idx"] + 1,
            )

        final = jax.lax.while_loop(cond, body, init)
        return final["upper_alpha"]

    core = jax.custom_jvp(_core)

    @core.defjvp
    def _core_jvp(primals, tangents):
        out = _core(*primals)
        return out, jnp.zeros_like(out)

    if active is None:
        active = jnp.ones(base_error.shape, dtype=bool)
    if init_alpha is None:
        init_alpha = jnp.ones(base_error.shape, dtype=parameters.dtype)
    return core(
        jax.lax.stop_gradient(parameters),
        jax.lax.stop_gradient(search_direction),
        jax.lax.stop_gradient(base_error),
        jax.lax.stop_gradient(base_gradient),
        active,
        jax.lax.stop_gradient(init_alpha),
    )
