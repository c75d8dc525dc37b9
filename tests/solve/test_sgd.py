import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.solve import SGDConfig, sgd_solve

from .reference_functions import square_error, log_square_error


def test_sphere_converges(rng):
    x0 = jnp.asarray(rng.normal(size=(8, 3)))
    out = sgd_solve(square_error, x0, SGDConfig(learning_rate=0.1, iterations=200))
    np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-5)


def test_log_sphere_slow_but_monotone(rng):
    x0 = jnp.asarray(rng.normal(size=(4, 3)) * 5.0)
    out = sgd_solve(
        log_square_error, x0, SGDConfig(learning_rate=0.5, iterations=50)
    )
    assert np.all(
        np.asarray(log_square_error(out)) <= np.asarray(log_square_error(x0))
    )


def test_eval_zero_gradient(rng):
    x0 = jnp.asarray(rng.normal(size=(2, 3)))
    g = jax.grad(
        lambda x: sgd_solve(
            square_error, x, SGDConfig(learning_rate=0.1, iterations=5)
        ).sum()
    )(x0)
    np.testing.assert_array_equal(g, np.zeros_like(x0))


def test_differentiable_mode_gradient_flows(rng):
    x0 = jnp.asarray(rng.normal(size=(2, 3)))
    g = jax.grad(
        lambda x: sgd_solve(
            square_error,
            x,
            SGDConfig(learning_rate=0.1, iterations=5),
            differentiable=True,
        ).sum()
    )(x0)
    # x_{k+1} = (1 - 2 lr) x_k  => d out/d x0 = (1 - 2*0.1)^5 = 0.8^5
    np.testing.assert_allclose(g, np.full_like(x0, 0.8**5), rtol=1e-6)
