"""Deeper Wolfe-condition property battery (the reference's
``test_wolffe_conditions.py`` / ``test_line_search_strong_wolfe_conditions``
patterns): nonconvex objectives, mixed batches, tolerance of extreme
curvature, and solver-in-the-loop behaviour."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.solve import line_search_wolfe_conditions

from .reference_functions import rosenbrock_function, easom_function

C1, C2 = 1e-4, 0.9


def _grad(fn, x):
    err, pullback = jax.vjp(fn, x)
    (g,) = pullback(jnp.ones_like(err))
    return err, g


def _wolfe_holds(fn, x, d, alpha, strong=True):
    err0, g0 = _grad(fn, x)
    dphi0 = jnp.sum(d * g0, axis=-1)
    err_a, g_a = _grad(fn, x + alpha[..., None] * d)
    dphi_a = jnp.sum(d * g_a, axis=-1)
    dec = np.asarray(err_a) <= np.asarray(err0 + C1 * alpha * dphi0) + 1e-9
    if strong:
        curv = np.abs(np.asarray(dphi_a)) <= -C2 * np.asarray(dphi0) + 1e-9
    else:
        curv = -np.asarray(dphi_a) <= -C2 * np.asarray(dphi0) + 1e-9
    return dec, curv


@pytest.mark.parametrize("zoom", ["bisection", "interpolate"])
def test_rosenbrock_steepest_descent_steps(rng, zoom):
    x = jnp.asarray(rng.normal(size=(16, 2)) * 0.5)
    err0, g0 = _grad(rosenbrock_function, x)
    d = -g0
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, rosenbrock_function, zoom_method=zoom
    )
    dec, curv = _wolfe_holds(rosenbrock_function, x, d, alpha)
    assert dec.all(), np.asarray(alpha)[~dec]
    assert curv.all(), np.asarray(alpha)[~curv]


def test_easom_flat_region_does_not_blow_up():
    # gradients vanish away from the minimum: widening doubles many times;
    # the search must terminate and not return inf/nan
    x = jnp.asarray([[0.0, 0.0]])
    err0, g0 = _grad(easom_function, x)
    d = -g0
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, easom_function, max_iterations=80
    )
    assert np.all(np.isfinite(alpha))


def test_mixed_batch_of_scales(rng):
    # elements needing alpha ~1e-3 and ~1e3 in the same lockstep batch
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[1.0], [1000.0], [0.001]])
    d = jnp.asarray([[-1000.0], [-1.0], [-0.001]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn)
    dec, curv = _wolfe_holds(fn, x, d, alpha)
    assert dec.all() and curv.all()


def test_quartic_overshoot_recovers(rng):
    fn = lambda x: jnp.sum(x**4, axis=-1)
    x = jnp.asarray(rng.normal(size=(8, 3)) + 2.0)
    err0, g0 = _grad(fn, x)
    d = -g0
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn)
    dec, curv = _wolfe_holds(fn, x, d, alpha)
    assert dec.all() and curv.all()


def test_weak_vs_strong_difference(rng):
    # the weak condition admits at least every strong-admissible point:
    # both searches must satisfy the weak conditions
    fn = lambda x: jnp.sum(jnp.square(x - 2.0), axis=-1)
    x = jnp.asarray(rng.normal(size=(6, 4)))
    err0, g0 = _grad(fn, x)
    d = -g0
    for strong in (True, False):
        alpha = line_search_wolfe_conditions(
            x, d, err0, g0, fn, strong=strong
        )
        dec, curv = _wolfe_holds(fn, x, d, alpha, strong=False)
        assert dec.all() and curv.all()


def test_iteration_cap_returns_finite(rng):
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray(rng.normal(size=(4, 2)))
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(
        x, -g0, err0, g0, fn, max_iterations=1
    )
    assert np.all(np.isfinite(alpha))


def test_invalid_conditions_raise():
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.zeros((1, 2))
    with pytest.raises(ValueError):
        line_search_wolfe_conditions(
            x, x, jnp.zeros(1), x, fn, sufficient_decrease=0.95, curvature=0.5
        )
