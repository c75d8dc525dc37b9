import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import (
    CalibrationExperiment,
    create_train_state,
    make_eval_step,
    make_train_step,
    fit,
)

TINY = CalibrationExperiment(
    num_views=3,
    num_points=4,
    hidden_size=16,
    batch_size=8,
    batches_per_epoch=2,
    val_batches=1,
    epochs=1,
    schedule="constant",  # warmup starts at lr 0: first step is a no-op
    solver=BFGSConfig(
        error_threshold=1e-7,
        training_error_threshold=1e-3,
        iterations=5,
        training_iterations=2,
        drop_path_p=0.1,
        line_search_iterations=10,
    ),
)


def test_train_step_updates_params(key):
    network, state = create_train_state(TINY, key)
    train_step = make_train_step(network, TINY)
    new_state, metrics = train_step(state, jax.random.fold_in(key, 1))
    assert np.isfinite(metrics["loss"])
    changed = jax.tree_util.tree_map(
        lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
        state.params,
        new_state.params,
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_metric_names_match_reference_semantics(key):
    import dataclasses

    cfg = dataclasses.replace(TINY, structure_weight=0.0)
    network, state = create_train_state(cfg, key)
    eval_step = make_eval_step(network, cfg)
    metrics = eval_step(state, key)
    assert set(metrics) == {
        "loss",
        "mean_error",
        "focal_length_loss",
        "cx_loss",
        "cy_loss",
    }
    total = (
        metrics["mean_error"]
        + metrics["focal_length_loss"]
        + metrics["cx_loss"]
        + metrics["cy_loss"]
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(total), rtol=1e-6)


def test_structure_supervision_included_by_default(key):
    network, state = create_train_state(TINY, key)
    eval_step = make_eval_step(network, TINY)
    metrics = eval_step(state, key)
    assert "structure_loss" in metrics
    assert np.isfinite(float(metrics["structure_loss"]))
    total = (
        metrics["mean_error"]
        + metrics["focal_length_loss"]
        + metrics["cx_loss"]
        + metrics["cy_loss"]
        + TINY.structure_weight * metrics["structure_loss"]
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(total), rtol=1e-6)


def test_fit_one_epoch_runs_and_logs():
    logged = []
    state, history = fit(
        TINY, epochs=1, log_fn=lambda split, epoch, m: logged.append((split, epoch))
    )
    assert len(history["train"]) == 1
    assert len(history["val"]) == 1
    assert ("train", 0) in logged and ("val", 0) in logged
    assert np.isfinite(history["train"][0]["loss"])
