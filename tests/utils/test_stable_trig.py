"""Three-regime value + gradient checks for the stable trig ratios.

Mirrors the reference test strategy (gradcheck at large x, small x, and
straddling the Taylor-switch threshold), using jax.test_util.check_grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from davo_tpu.utils import (
    sin_x_on_x,
    one_minus_cos_x_on_x_squared,
    cos_x_on_x_squared_minus_sin_x_on_x_cubed,
    sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth,
)


def _reference_values(x):
    # Cancellation-free formulations so the reference itself is accurate at
    # small x: 1 - cos(x) == 2 sin^2(x/2).
    x = np.asarray(x, dtype=np.float64)
    one_minus_cos = 2.0 * np.sin(x / 2.0) ** 2
    return {
        "sinc": np.sin(x) / x,
        "one_minus_cos": one_minus_cos / x**2,
        "cos_sin": (np.cos(x) - np.sin(x) / x) / x**2,
        "sin_cubed": (np.sin(x) / x - 2.0 * one_minus_cos / x**2) / x**2,
    }


FUNCS = {
    "sinc": sin_x_on_x,
    "one_minus_cos": one_minus_cos_x_on_x_squared,
    "cos_sin": cos_x_on_x_squared_minus_sin_x_on_x_cubed,
    "sin_cubed": sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth,
}

LIMITS = {
    "sinc": 1.0,
    "one_minus_cos": 0.5,
    "cos_sin": -1.0 / 3.0,
    "sin_cubed": -1.0 / 12.0,
}

# Regimes: well above the switch, well below it, and straddling it.
# Kept small: check_grads finite-differences every element.
REGIMES = {
    "large": np.asarray([0.5, 1.3, 2.9, 6.0]),
    "small": np.asarray([1e-4, 3e-3, 2e-2, 4e-2]),
    "threshold": np.asarray([0.03, 0.049, 0.051, 0.2, 0.251, 0.3]),
    "negative": np.asarray([-6.0, -2.3, -0.7]),
}


@pytest.mark.parametrize("name", list(FUNCS))
@pytest.mark.parametrize("regime", list(REGIMES))
def test_values_match_naive_formula(name, regime):
    x = REGIMES[regime]
    expected = _reference_values(x)[name]
    actual = FUNCS[name](jnp.asarray(x))
    # The naive float64 reference loses ~eps/x^2 of relative accuracy to
    # cancellation at tiny x; our Taylor branch is the more accurate one.
    rtol = 1e-7 if regime == "small" else 1e-10
    np.testing.assert_allclose(actual, expected, rtol=rtol, atol=1e-14)


@pytest.mark.parametrize("name", list(FUNCS))
def test_value_at_zero_is_limit(name):
    actual = FUNCS[name](jnp.zeros(()))
    np.testing.assert_allclose(actual, LIMITS[name], rtol=1e-12)


@pytest.mark.parametrize("name", list(FUNCS))
@pytest.mark.parametrize("regime", list(REGIMES))
def test_gradients_three_regimes(name, regime):
    x = jnp.asarray(REGIMES[regime])
    check_grads(FUNCS[name], (x,), order=2, modes=("fwd", "rev"), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("name", list(FUNCS))
def test_gradient_finite_at_zero(name):
    g = jax.grad(lambda v: FUNCS[name](v).sum())(jnp.zeros((3,)))
    assert np.all(np.isfinite(g))
    # All four ratios are even functions, so the derivative at 0 is 0.
    np.testing.assert_allclose(g, 0.0, atol=1e-12)


@pytest.mark.parametrize("name", list(FUNCS))
def test_second_order_gradient_finite_at_zero(name):
    h = jax.grad(jax.grad(lambda v: FUNCS[name](v)))(0.0)
    assert np.isfinite(h)


def test_derivative_chain_identities():
    # d/dx sinc = x * cos_sin;  d/dx one_minus_cos = x * sin_cubed.
    x = jnp.asarray(np.linspace(0.01, 3.0, 50))
    d_sinc = jax.vmap(jax.grad(sin_x_on_x))(x)
    np.testing.assert_allclose(
        d_sinc, x * cos_x_on_x_squared_minus_sin_x_on_x_cubed(x), rtol=1e-10
    )
    d_omc = jax.vmap(jax.grad(one_minus_cos_x_on_x_squared))(x)
    np.testing.assert_allclose(
        d_omc,
        x * sin_x_on_x_cubed_minus_two_one_minus_cos_x_on_x_fourth(x),
        rtol=1e-10,
        atol=1e-14,
    )


def test_jit_compiles():
    for fn in FUNCS.values():
        out = jax.jit(fn)(jnp.asarray([0.0, 0.04, 1.0]))
        assert np.all(np.isfinite(out))
