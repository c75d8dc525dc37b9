import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import ba_params_to_vector, num_ba_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models import (
    num_guess_parameters,
    guess_vector_to_params,
    PinholeMLPGuess,
    PinholeTransformerGuess,
    PinholeFixedGuess,
)

M, N = 3, 5


@pytest.fixture()
def batch(key):
    return generate_batch(key, 4, SceneConfig(num_views=M, num_points=N))


def test_num_guess_parameters():
    assert num_guess_parameters(4, 8) == 3 + 24 + 12 + 5


def test_guess_vector_unpack_layout(rng):
    g = num_guess_parameters(M, N)
    x = jnp.arange(g, dtype=jnp.float64)
    params = guess_vector_to_params(x, M, N)
    assert float(params.focal_length) == 0.0
    assert float(params.cx) == 1.0 and float(params.cy) == 2.0
    assert params.orientation.shape == (M, 3)
    assert params.translation.shape == (M, 3)
    assert params.world_points.shape == (N - 2, 3)
    # first free point z gauge-fixed to zero
    assert float(params.world_points[0, 2]) == 0.0


def test_guess_vector_wrong_size_raises():
    with pytest.raises(ValueError):
        guess_vector_to_params(jnp.zeros(7), M, N)


@pytest.mark.parametrize(
    "module",
    [
        PinholeMLPGuess(num_views=M, num_points=N, num_hidden=16),
        PinholeTransformerGuess(
            num_views=M, num_points=N, num_estimates=2, embed_dim=16, num_layers=1
        ),
        PinholeFixedGuess(num_views=M, num_points=N),
    ],
    ids=["mlp", "transformer", "fixed"],
)
def test_guess_modules_produce_valid_params(module, batch, key):
    variables = module.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out = module.apply(
        variables, batch.projected_points, batch.visibility_mask
    )
    e = out.focal_length.shape[-1]
    assert out.focal_length.shape == (4, e)
    assert out.translation.shape == (4, e, M, 3)
    assert out.orientation.shape == (4, e, M, 3)
    assert out.world_points.shape == (4, e, N - 2, 3)
    vec = ba_params_to_vector(out)
    assert vec.shape == (4, e, num_ba_parameters(M, N))
    assert np.all(np.isfinite(vec))


def test_transformer_guess_applies_with_params_only(batch, key):
    # regression: the pixel projection must not live in an extra variable
    # collection, or checkpoints carrying only params/batch_stats crash
    module = PinholeTransformerGuess(
        num_views=M, num_points=N, num_estimates=2, embed_dim=16, num_layers=1
    )
    variables = module.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    assert set(variables.keys()) == {"params"}
    out = module.apply(
        {"params": variables["params"]},
        batch.projected_points,
        batch.visibility_mask,
    )
    assert np.all(np.isfinite(out.focal_length))


def test_transformer_guess_multiple_estimates(batch, key):
    module = PinholeTransformerGuess(
        num_views=M, num_points=N, num_estimates=3, embed_dim=16, num_layers=1
    )
    variables = module.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out = module.apply(variables, batch.projected_points, batch.visibility_mask)
    assert out.focal_length.shape == (4, 3)
    # estimates should differ (distinct learned estimate tokens)
    vec = np.asarray(ba_params_to_vector(out))
    assert not np.allclose(vec[:, 0], vec[:, 1])


def test_fixed_guess_same_for_all_batch_elements(batch, key):
    module = PinholeFixedGuess(num_views=M, num_points=N)
    variables = module.init(
        {"params": key}, batch.projected_points, batch.visibility_mask
    )
    out = module.apply(variables, batch.projected_points, batch.visibility_mask)
    vec = np.asarray(ba_params_to_vector(out))
    np.testing.assert_array_equal(vec[0], vec[1])
    # initial depth is the configured start distance
    np.testing.assert_allclose(out.translation[0, 0, :, 2], 20.0)
