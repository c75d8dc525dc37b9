import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.models import (
    MLPSolver,
    TransformerSolver,
    SearchDirectionHeuristic,
)

P = 4


def _error_fn(target):
    return lambda x: jnp.sum(jnp.square(x - target), axis=-1)


@pytest.mark.parametrize(
    "module",
    [
        MLPSolver(
            num_steps=2,
            num_parameters=P,
            search_direction_hidden=16,
            line_search_hidden=16,
        ),
        MLPSolver(
            num_steps=2,
            num_parameters=P,
            search_direction_hidden=16,
            line_search_hidden=16,
            recurrent=True,
        ),
        TransformerSolver(
            num_steps=2,
            num_parameters=P,
            embed_dim=16,
            num_heads=2,
            search_direction_layers=1,
            line_search_layers=1,
        ),
        TransformerSolver(
            num_steps=2,
            num_parameters=P,
            embed_dim=16,
            num_heads=2,
            search_direction_layers=1,
            line_search_layers=1,
            recurrent=True,
        ),
    ],
    ids=["mlp", "mlp-recurrent", "transformer", "transformer-recurrent"],
)
@pytest.mark.slow
def test_learned_solver_runs_and_is_trainable(module, rng, key):
    target = jnp.asarray(rng.normal(size=(2, 3, P)))
    x0 = jnp.asarray(rng.normal(size=(2, 3, P)))
    fn = _error_fn(target)
    variables = module.init({"params": key}, x0, fn)
    out = module.apply(variables, x0, fn)
    assert out.shape == x0.shape
    assert np.all(np.isfinite(out))

    def loss(params):
        result = module.apply({**variables, "params": params}, x0, fn)
        return jnp.mean(fn(result))

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    assert any(np.any(np.asarray(g) != 0.0) for g in leaves)


def test_recurrent_variants_share_weights(key, rng):
    shared = MLPSolver(
        num_steps=3,
        num_parameters=P,
        search_direction_hidden=8,
        line_search_hidden=8,
        recurrent=True,
    )
    x0 = jnp.asarray(rng.normal(size=(1, 2, P)))
    fn = _error_fn(jnp.zeros((1, 2, P)))
    variables = shared.init({"params": key}, x0, fn)
    # only one step's worth of parameters exists
    assert set(variables["params"].keys()) == {"solver_step"}


def test_search_direction_heuristic_gates(key, rng):
    module = SearchDirectionHeuristic(num_parameters=P)
    direction = jnp.asarray(rng.normal(size=(3, P)))
    variables = module.init({"params": key}, direction, 0.0)
    out = module.apply(variables, direction, 2.0)
    assert out.shape == direction.shape
    # sigmoid gate in (0, 1): output magnitude never exceeds the input
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(direction)))
