"""Gen-1 protocol solver: BFGS over IOptimisableFunction objects.

Feature parity target: ``solvers/bfgs_camera_solver.py`` +
``solvers/line_search_strong_wolfe_conditions.py`` in the reference.  The
object protocol is a thin veneer: internally the object's flat parameter
vector is optimised with the same lockstep :func:`davo_tpu.solve.bfgs_solve`
machinery, using the object's *analytic* ``get_gradient`` (no autodiff in
the loop — the defining property of the gen-1 stack).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .bfgs import BFGSConfig, bfgs_solve

__all__ = ["BFGSCameraSolverConfig", "bfgs_solve_function"]


@dataclasses.dataclass(frozen=True)
class BFGSCameraSolverConfig:
    """Reference ``BFGSCameraSolver.__init__`` knobs
    (``solvers/bfgs_camera_solver.py:22-37``)."""

    max_iterations: int = 10
    epsilon: float = 1e-6
    max_step_distance: float = 1e5
    min_step_distance: float = 1e-8
    sufficient_decrease: float = 1e-4
    curvature: float = 0.9
    line_search_max_step: float = 1e5
    line_search_zoom_iterations: int = 20
    strong: bool = True


def bfgs_solve_function(
    function,
    config: BFGSCameraSolverConfig = BFGSCameraSolverConfig(),
    direction_fn=None,
):
    """Run batched BFGS + strong-Wolfe over an
    :class:`davo_tpu.camera.IOptimisableFunction`.

    :param function: the objective object (parameters ``(B, E, P)``).
    :param direction_fn: optional learned direction modifier
        ``(direction, params, error, step_idx) -> direction``.
    :return: a new objective object at the optimised parameters.
    """
    base_vector = function.as_parameters_vector()

    def error_fn(vec):
        return function.add(vec - base_vector).get_error()

    def value_and_grad_fn(vec):
        return function.add(vec - base_vector).get_error_and_gradient()

    solver = BFGSConfig(
        sufficient_decrease=config.sufficient_decrease,
        curvature=config.curvature,
        error_threshold=config.epsilon,
        iterations=config.max_iterations,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=config.line_search_zoom_iterations + 32,
        max_step_size=config.line_search_max_step,
        zoom_method="interpolate",
        strong=config.strong,
        max_step_distance=config.max_step_distance,
        min_step_distance=config.min_step_distance,
    )
    solved = bfgs_solve(
        error_fn,
        base_vector,
        solver,
        value_and_grad_fn=value_and_grad_fn,
        direction_fn=direction_fn,
    )
    return function.add(solved - base_vector)
