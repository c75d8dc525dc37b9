"""Learned-solver training harness: truth vectors, learning, comparison."""

import dataclasses
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.camera import calibration_error
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.train.learned_solver import (
    LearnedSolverExperiment,
    compare_with_bfgs,
    create_learned_solver_state,
    fit_learned_solver,
    make_learned_solver_step,
    true_calibration_vector,
)


def _tiny(**kw):
    base = dict(
        solver_type="mlp",
        num_steps=2,
        num_views=3,
        num_points=4,
        hidden_size=32,
        batch_size=16,
        batches_per_epoch=4,
        epochs=1,
        start_noise=0.3,
    )
    base.update(kw)
    return LearnedSolverExperiment(**base)


def test_true_calibration_vector_is_near_zero_error(fixed_random_seed):
    config = _tiny()
    batch = generate_batch(
        jax.random.key(fixed_random_seed), 8, config.resolved_scene()
    )
    truth = true_calibration_vector(batch)
    err = calibration_error(
        truth,
        batch.projected_points,
        batch.visibility_mask.astype(truth.dtype),
    )
    # the truth parameters reproject exactly (angle error ~ roundoff)
    assert float(jnp.max(err)) < 1e-5


def test_training_reduces_objective(fixed_random_seed):
    # learned solvers learn slowly — probe at a raised lr over more steps,
    # with the per-step descent-aligned signal (the final-objective signal
    # is measured-marginal at this budget: round-2 negative result)
    config = _tiny(learning_rate=1e-3, loss_mode="descent")
    key = jax.random.key(fixed_random_seed)
    network, state = create_learned_solver_state(config, key)
    train_step = make_learned_solver_step(network, config)
    k0 = jax.random.fold_in(key, 0)
    _, first = train_step(state, k0)
    for i in range(60):
        state, _ = train_step(state, jax.random.fold_in(key, i))
    _, final = train_step(state, k0)
    assert np.isfinite(float(final["loss"]))
    assert float(final["loss"]) < float(first["loss"])
    assert float(final["final_error"]) < float(first["final_error"])


@pytest.mark.slow
def test_transformer_variant_runs(fixed_random_seed):
    config = _tiny(solver_type="transformer", embed_dim=32, num_heads=2)
    key = jax.random.key(fixed_random_seed)
    network, state = create_learned_solver_state(config, key)
    train_step = make_learned_solver_step(network, config)
    state, metrics = train_step(state, jax.random.fold_in(key, 0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_compare_with_bfgs_table(fixed_random_seed):
    config = _tiny()
    key = jax.random.key(fixed_random_seed)
    network, state, _ = fit_learned_solver(
        dataclasses.replace(config, epochs=1, batches_per_epoch=2)
    )
    table = compare_with_bfgs(network, state, config, key, batches=1)
    assert set(table) == {"start", "learned", "bfgs_equal_budget", "bfgs_4x_budget"}
    for row in table.values():
        assert np.isfinite(row["objective"])
        assert 0.0 <= row["basin_rate"] <= 1.0
    # BFGS must improve on the raw starts; sanity of the harness itself
    assert table["bfgs_4x_budget"]["objective"] < table["start"]["objective"]


def test_descent_loss_mode_trains():
    """Per-step descent-aligned loss (VERDICT r2 next #6): finite loss,
    gradients flow, loss is the mean per-step relative error ratio."""
    import jax
    import numpy as np

    from davo_tpu.train.learned_solver import (
        LearnedSolverExperiment,
        create_learned_solver_state,
        make_learned_solver_step,
    )

    cfg = LearnedSolverExperiment(
        solver_type="mlp", loss_mode="descent", num_steps=2,
        batch_size=4, hidden_size=8, num_views=3, num_points=4,
    )
    key = jax.random.key(0)
    network, state = create_learned_solver_state(cfg, key)
    step = make_learned_solver_step(network, cfg)
    new_state, metrics = step(state, jax.random.fold_in(key, 1))
    assert np.isfinite(float(metrics["loss"]))
    # params changed (gradients flowed into every step's weights)
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(new_state.params)
    assert any(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 0
        for a, b in zip(leaves_a, leaves_b)
    )


@pytest.mark.slow
def test_direction_gate_trains_inside_bfgs():
    """solver_type='direction': the SearchDirectionHeuristic gate trains
    through the real BFGS solve and evaluates via the direction_fn hook."""
    import jax
    import numpy as np

    from davo_tpu.train.learned_solver import (
        LearnedSolverExperiment,
        compare_with_bfgs,
        create_learned_solver_state,
        make_learned_solver_step,
    )

    cfg = LearnedSolverExperiment(
        solver_type="direction", num_steps=2,
        batch_size=4, hidden_size=8, num_views=3, num_points=4,
    )
    key = jax.random.key(0)
    network, state = create_learned_solver_state(cfg, key)
    step = make_learned_solver_step(network, cfg)
    new_state, metrics = step(state, jax.random.fold_in(key, 1))
    assert np.isfinite(float(metrics["loss"]))
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(new_state.params)
    assert any(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 0
        for a, b in zip(leaves_a, leaves_b)
    )
    table = compare_with_bfgs(network, new_state, cfg, key, batches=1)
    assert np.isfinite(table["learned"]["objective"])
    assert np.isfinite(table["bfgs_equal_budget"]["objective"])
