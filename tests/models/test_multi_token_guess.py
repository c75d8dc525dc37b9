"""Multi-token guess head: shapes, WTA training, token restart proposals."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.models.calibration_network import CalibrationNetwork
from davo_tpu.solve import BFGSConfig
from davo_tpu.train.calibration import (
    CalibrationExperiment,
    create_train_state,
    make_train_step,
)

SOLVER = BFGSConfig(iterations=2, line_search_iterations=4, drop_path_p=0.0)


def _net(tokens, restarts=1, proposals="noise"):
    return CalibrationNetwork(
        num_views=3,
        num_points=4,
        hidden_size=32,
        head="transformer",
        transformer_layers=1,
        transformer_heads=2,
        guess_tokens=tokens,
        num_restarts=restarts,
        restart_proposals=proposals,
        solver=SOLVER,
        fused_objective=False,
    )


def _scene(key, b=2, m=3, n=4):
    pixels = 0.4 * jax.random.normal(key, (b, m, n, 2))
    vis = jnp.ones((b, m, n), bool)
    return pixels, vis


def test_training_forward_returns_all_tokens(fixed_random_seed):
    key = jax.random.key(fixed_random_seed)
    net = _net(tokens=4)
    pixels, vis = _scene(key)
    variables = net.init({"params": key}, pixels, vis, training=True)
    out, err = net.apply(
        variables, pixels, vis, training=True, return_error=True,
        mutable=["batch_stats"],
    )[0]
    p = net.num_views * 0 + out.shape[-1]
    assert out.shape == (2, 4, p)
    assert err.shape == (2, 4)
    # tokens differ from each other at init (independent readout params)
    assert float(jnp.max(jnp.abs(out[:, 0] - out[:, 1]))) > 0.0


def test_eval_token_restarts_solve_and_select(fixed_random_seed):
    key = jax.random.key(fixed_random_seed)
    net = _net(tokens=4, restarts=4, proposals="tokens")
    pixels, vis = _scene(key)
    variables = net.init({"params": key}, pixels, vis, training=True)
    out = net.apply(variables, pixels, vis, training=False)
    assert out.ndim == 2  # one selected estimate per element
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_eval_token_restarts_pad_with_noise(fixed_random_seed):
    key = jax.random.key(fixed_random_seed)
    net = _net(tokens=2, restarts=5, proposals="tokens")
    pixels, vis = _scene(key)
    variables = net.init({"params": key}, pixels, vis, training=True)
    out = net.apply(
        variables, pixels, vis, training=False,
        rngs={"restarts": jax.random.fold_in(key, 1)},
    )
    assert out.ndim == 2 and np.all(np.isfinite(np.asarray(out)))


def test_tokens_require_transformer_head():
    with pytest.raises(ValueError, match="transformer"):
        CalibrationNetwork(
            num_views=3, num_points=4, head="mlp", guess_tokens=2,
            solver=SOLVER,
        ).init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 3, 4, 2)),
            jnp.ones((1, 3, 4), bool),
        )


@pytest.mark.slow
def test_wta_training_step_runs_and_learns(fixed_random_seed):
    config = CalibrationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=32,
        head="transformer",
        transformer_layers=1,
        transformer_heads=2,
        guess_tokens=4,
        batch_size=8,
        learning_rate=1e-3,
        solver=dataclasses.replace(SOLVER, training_iterations=0),
    )
    key = jax.random.key(fixed_random_seed)
    network, state = create_train_state(config, key)
    train_step = make_train_step(network, config)
    k0 = jax.random.fold_in(key, 0)
    _, first = train_step(state, k0)
    assert "token_usage_entropy" in first
    for i in range(25):
        state, _ = train_step(state, jax.random.fold_in(key, i))
    _, final = train_step(state, k0)
    assert np.isfinite(float(final["loss"]))
    assert float(final["loss"]) < float(first["loss"])


def test_single_token_path_unchanged(fixed_random_seed):
    # guess_tokens=1 must be byte-compatible with the original head: same
    # param tree structure (readout_token (1, d)), same output shape
    key = jax.random.key(fixed_random_seed)
    net = _net(tokens=1)
    pixels, vis = _scene(key)
    variables = net.init({"params": key}, pixels, vis, training=True)
    readout = variables["params"]["initial_estimator"]["readout_token"]
    assert readout.shape[0] == 1
    out = net.apply(variables, pixels, vis, training=False)
    assert out.ndim == 2
