import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.camera import PinholeBAConfig
from davo_tpu.solve import BFGSConfig
from davo_tpu.train import (
    OptimisationExperiment,
    create_optimisation_state,
    make_optimisation_train_step,
)

TINY = OptimisationExperiment(
    num_views=3,
    num_points=4,
    hidden_size=16,
    batch_size=4,
    solver=BFGSConfig(
        error_threshold=1e-6,
        iterations=3,
        drop_path_p=0.0,
        line_search_iterations=8,
        max_step_size=32.0,
    ),
)


def test_optimisation_train_step(key):
    model, state = create_optimisation_state(TINY, key)
    step = make_optimisation_train_step(model, TINY)
    new_state, metrics = step(state, jax.random.fold_in(key, 1))
    assert set(metrics) == {
        "loss",
        "mean_error",
        "focal_length_loss",
        "cx_loss",
        "cy_loss",
    }
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree_util.tree_map(
        lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
        state.params,
        new_state.params,
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_guess_only_variant(key):
    cfg = OptimisationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=16,
        batch_size=4,
        solver_enabled=False,
    )
    model, state = create_optimisation_state(cfg, key)
    step = make_optimisation_train_step(model, cfg)
    _, metrics = step(state, jax.random.fold_in(key, 2))
    assert np.isfinite(float(metrics["loss"]))
