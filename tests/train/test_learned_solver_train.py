"""Learned-solver training harness: truth vectors, learning, comparison."""

import dataclasses

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
    # learned solvers learn slowly — probe at a raised lr over more steps
    config = _tiny(learning_rate=1e-3)
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


def test_transformer_variant_runs(fixed_random_seed):
    config = _tiny(solver_type="transformer", embed_dim=32, num_heads=2)
    key = jax.random.key(fixed_random_seed)
    network, state = create_learned_solver_state(config, key)
    train_step = make_learned_solver_step(network, config)
    state, metrics = train_step(state, jax.random.fold_in(key, 0))
    assert np.isfinite(float(metrics["loss"]))


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
