import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    PinholeBAConfig,
    PinholeBAData,
    PinholeBAParams,
    ba_error,
    ba_project,
)
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models import GuessAndSolverModel, InitialGuessModel, PinholeMLPGuess, solve_ba
from davo_tpu.solve import BFGSConfig

M, N = 3, 5
SOLVER = BFGSConfig(
    error_threshold=1e-9,
    iterations=10,
    drop_path_p=0.0,
    line_search_iterations=20,
)


def _perfect_scene(rng):
    params = PinholeBAParams(
        focal_length=jnp.asarray([[1.4]]),
        cx=jnp.asarray([[0.05]]),
        cy=jnp.asarray([[-0.05]]),
        translation=jnp.asarray(rng.normal(size=(1, 1, M, 3)) * 0.3).at[
            ..., 2
        ].add(4.0),
        orientation=jnp.asarray(rng.normal(size=(1, 1, M, 3)) * 0.1),
        world_points=jnp.asarray(
            np.concatenate(
                [rng.normal(size=(1, 1, N - 2, 2)) * 0.5,
                 2.0 + np.abs(rng.normal(size=(1, 1, N - 2, 1)))],
                axis=-1,
            )
        ),
    )
    uv = ba_project(params)
    data = PinholeBAData(
        true_projected_points=uv,
        visibility_mask=jnp.ones((1, 1, M, N), dtype=bool),
    )
    return params, data


def test_solve_ba_recovers_perturbed_scene(rng):
    params, data = _perfect_scene(rng)
    noisy = params._replace(
        translation=params.translation + 0.02,
        world_points=params.world_points + 0.02,
    )
    start_err = float(ba_error(noisy, data)[0, 0])
    solved = solve_ba(noisy, data, PinholeBAConfig(), SOLVER)
    end_err = float(ba_error(solved, data)[0, 0])
    assert end_err < start_err * 0.1


def test_guess_and_solver_model_runs(key):
    batch = generate_batch(key, 2, SceneConfig(num_views=M, num_points=N))
    model = GuessAndSolverModel(
        initial_guess=PinholeMLPGuess(num_views=M, num_points=N, num_hidden=16),
        solver=BFGSConfig(
            error_threshold=1e-6,
            iterations=3,
            drop_path_p=0.0,
            line_search_iterations=10,
        ),
    )
    variables = model.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    solved, err = model.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    assert solved.focal_length.shape == (2, 1)
    assert err.shape == (2, 1)
    assert np.all(np.isfinite(err))


def test_solver_does_not_worsen_guess(key):
    batch = generate_batch(key, 2, SceneConfig(num_views=M, num_points=N))
    guess_net = PinholeMLPGuess(num_views=M, num_points=N, num_hidden=16)
    solver_model = GuessAndSolverModel(initial_guess=guess_net, solver=SOLVER)
    guess_model = InitialGuessModel(initial_guess=guess_net)
    variables = solver_model.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    _, err_solved = solver_model.apply(
        variables, batch.projected_points, batch.visibility_mask, return_error=True
    )
    _, err_guess = guess_model.apply(
        variables, batch.projected_points, batch.visibility_mask, return_error=True
    )
    assert np.all(np.asarray(err_solved) <= np.asarray(err_guess) + 1e-9)
