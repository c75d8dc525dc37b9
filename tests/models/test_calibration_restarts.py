import jax
import numpy as np
import pytest

from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models import CalibrationNetwork
from davo_tpu.solve import BFGSConfig

M, N = 3, 5
SOLVER = BFGSConfig(
    error_threshold=1e-7,
    iterations=6,
    drop_path_p=0.0,
    line_search_iterations=10,
)


def test_multi_start_never_worse_than_single(key):
    batch = generate_batch(key, 4, SceneConfig(num_views=M, num_points=N))
    single = CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=16, solver=SOLVER, num_restarts=1
    )
    multi = CalibrationNetwork(
        num_views=M, num_points=N, hidden_size=16, solver=SOLVER, num_restarts=4
    )
    variables = single.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    _, err_single = single.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    _, err_multi = multi.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        return_error=True,
    )
    # estimate 0 of the multi-start IS the single start: best-of can only
    # be <= up to solver stochasticity (there is none: same deterministic
    # solve)
    assert np.all(np.asarray(err_multi) <= np.asarray(err_single) + 1e-9)


def test_multi_start_training_mode_uses_single_path(key):
    batch = generate_batch(key, 2, SceneConfig(num_views=M, num_points=N))
    multi = CalibrationNetwork(
        num_views=M,
        num_points=N,
        hidden_size=16,
        solver=BFGSConfig(
            error_threshold=1e-7,
            training_error_threshold=1e-3,
            iterations=4,
            training_iterations=2,
            drop_path_p=0.1,
            line_search_iterations=8,
        ),
        num_restarts=4,
    )
    variables = multi.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out, _ = multi.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=True,
        return_error=True,
        rngs={"drop_path": key},
        mutable=["batch_stats"],
    )
    result, err = out
    assert result.shape[0] == 2
    assert np.all(np.isfinite(err))
