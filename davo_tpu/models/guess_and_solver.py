"""Gen-1 end-to-end compositions: guess network -> BA objective -> solver.

Feature parity targets: ``networks/guess_and_solver_model.py`` and
``networks/initial_guess_model.py`` in the reference.  The solver runs in
the flat BA-parameter space using the *analytic* error+gradient
(:func:`davo_tpu.camera.ba_error_and_gradient`) — no autodiff inside the
solve loop, exactly like the gen-1 stack
(``solvers/bfgs_camera_solver.py`` calls ``function.get_gradient()``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from davo_tpu.camera import (
    PinholeBAConfig,
    PinholeBAData,
    PinholeBAParams,
    ba_error,
    ba_error_and_gradient,
    ba_params_from_vector,
    ba_params_to_vector,
)
from davo_tpu.solve import BFGSConfig, bfgs_solve

__all__ = ["GuessAndSolverModel", "InitialGuessModel", "solve_ba"]


def solve_ba(
    params: PinholeBAParams,
    data: PinholeBAData,
    ba_config: PinholeBAConfig = PinholeBAConfig(),
    solver: BFGSConfig = BFGSConfig(drop_path_p=0.0),
    *,
    training: bool = False,
    key: Optional[jax.Array] = None,
    direction_fn=None,
) -> PinholeBAParams:
    """Refine BA parameters with batched BFGS + Wolfe using the analytic
    gradient path."""
    m, n = params.num_views, params.num_points

    def error_fn(vec):
        return ba_error(ba_params_from_vector(vec, m, n), data, ba_config)

    def value_and_grad_fn(vec):
        return ba_error_and_gradient(
            ba_params_from_vector(vec, m, n), data, ba_config
        )

    vec = ba_params_to_vector(params)
    solved = bfgs_solve(
        error_fn,
        vec,
        solver,
        training=training,
        key=key,
        value_and_grad_fn=value_and_grad_fn,
        direction_fn=direction_fn,
    )
    return ba_params_from_vector(solved, m, n)


class GuessAndSolverModel(nn.Module):
    """``initial_guess`` module -> BA objective -> BFGS solver
    (reference ``guess_and_solver_model.py:8-22``)."""

    initial_guess: nn.Module
    ba_config: PinholeBAConfig = PinholeBAConfig(constrain=True)
    solver: BFGSConfig = BFGSConfig(drop_path_p=0.0)

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
        return_error: bool = False,
    ):
        guess = self.initial_guess(
            projected_points, visibility_mask, training=training
        )
        # data broadcast over the estimates dimension E
        data = PinholeBAData(
            true_projected_points=projected_points[:, None],
            visibility_mask=visibility_mask[:, None],
        )
        drop_key = None
        if training and self.solver.drop_path_p > 0.0:
            drop_key = self.make_rng("drop_path")
        solved = solve_ba(
            guess,
            data,
            self.ba_config,
            self.solver,
            training=training,
            key=drop_key,
        )
        if return_error:
            return solved, ba_error(solved, data, self.ba_config)
        return solved


class InitialGuessModel(nn.Module):
    """Guess-only wrapper for ablations
    (reference ``initial_guess_model.py:8-20``)."""

    initial_guess: nn.Module
    ba_config: PinholeBAConfig = PinholeBAConfig(constrain=True)

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
        return_error: bool = False,
    ):
        guess = self.initial_guess(
            projected_points, visibility_mask, training=training
        )
        if return_error:
            data = PinholeBAData(
                true_projected_points=projected_points[:, None],
                visibility_mask=visibility_mask[:, None],
            )
            return guess, ba_error(guess, data, self.ba_config)
        return guess
