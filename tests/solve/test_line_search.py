"""Wolfe line-search property tests.

Mirrors the reference battery
(``tests/autograd_solvers/line_search/test_wolffe_conditions.py``): the
chosen point must actually satisfy the (strong) Wolfe conditions, the step
must scale both down and up, wrong directions and local minima must not
explode, and the search must propagate no gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.solve import line_search_wolfe_conditions

C1 = 1e-4
C2 = 0.9


def _grad(fn, x):
    err, pullback = jax.vjp(fn, x)
    (g,) = pullback(jnp.ones_like(err))
    return err, g


def _check_wolfe(fn, x, d, alpha, strong, c1=C1, c2=C2):
    err0, g0 = _grad(fn, x)
    dphi0 = jnp.sum(d * g0, axis=-1)
    err_a, g_a = _grad(fn, x + alpha[..., None] * d)
    dphi_a = jnp.sum(d * g_a, axis=-1)
    decrease_ok = np.asarray(err_a) <= np.asarray(err0 + c1 * alpha * dphi0) + 1e-10
    if strong:
        curv_ok = np.abs(np.asarray(dphi_a)) <= -c2 * np.asarray(dphi0) + 1e-10
    else:
        curv_ok = -np.asarray(dphi_a) <= -c2 * np.asarray(dphi0) + 1e-10
    return decrease_ok, curv_ok


@pytest.mark.parametrize("strong", [True, False])
def test_quadratic_satisfies_wolfe(strong, rng):
    fn = lambda x: jnp.sum(jnp.square(x - 3.0), axis=-1)
    x = jnp.asarray(rng.normal(size=(8, 4)))
    err0, g0 = _grad(fn, x)
    d = -g0
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn, strong=strong)
    decrease_ok, curv_ok = _check_wolfe(fn, x, d, alpha, strong)
    assert decrease_ok.all()
    assert curv_ok.all()


@pytest.mark.parametrize("strong", [True, False])
def test_small_gradient_direction_widens_up(strong):
    # Minimum far away along the direction: alpha must grow past 1.
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[100.0, 0.0]])
    d = jnp.asarray([[-1.0, 0.0]])  # unit step toward the minimum at 0
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn, strong=strong)
    assert float(alpha[0]) > 1.0
    decrease_ok, curv_ok = _check_wolfe(fn, x, d, alpha, strong)
    assert decrease_ok.all() and curv_ok.all()


@pytest.mark.parametrize("strong", [True, False])
def test_overshooting_direction_scales_down(strong):
    # Direction overshoots the minimum by 100x: needs alpha << 1.
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[1.0, 0.0]])
    d = jnp.asarray([[-200.0, 0.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn, strong=strong)
    assert 0.0 < float(alpha[0]) < 1.0
    decrease_ok, curv_ok = _check_wolfe(fn, x, d, alpha, strong)
    assert decrease_ok.all() and curv_ok.all()


def test_batch_elements_search_independently(rng):
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[100.0, 0.0], [1.0, 0.0], [0.5, 0.5]])
    d = jnp.asarray([[-1.0, 0.0], [-200.0, 0.0], [-1.0, -1.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn)
    decrease_ok, curv_ok = _check_wolfe(fn, x, d, alpha, True)
    assert decrease_ok.all() and curv_ok.all()
    assert float(alpha[0]) > 1.0 and float(alpha[1]) < 1.0


def test_at_local_minimum_returns_small_or_zero_step():
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.zeros((1, 2))
    err0, g0 = _grad(fn, x)
    d = jnp.asarray([[1.0, 0.0]])
    alpha = line_search_wolfe_conditions(x, d, err0, g0, fn, max_iterations=60)
    # gradient along d is 0: error cannot decrease; the search should not
    # return a big damaging step
    err_after = fn(x + alpha[..., None] * d)
    assert float(err_after[0]) <= float(err0[0]) + 1e-6 or float(alpha[0]) <= 1.0


def test_no_gradient_propagates(rng):
    fn = lambda x: jnp.sum(jnp.square(x - 2.0), axis=-1)

    def alpha_sum(x):
        err0, g0 = _grad(fn, x)
        return jnp.sum(
            line_search_wolfe_conditions(x, -g0, err0, g0, fn)
        )

    x = jnp.asarray(rng.normal(size=(4, 3)))
    g = jax.grad(alpha_sum)(x)
    np.testing.assert_array_equal(g, np.zeros_like(x))


def test_max_step_size_caps_widening():
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[1000.0]])
    d = jnp.asarray([[-1.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, fn, max_step_size=32.0
    )
    assert float(alpha[0]) <= 32.0


def test_interpolate_zoom_agrees_on_quadratic():
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[1.0, 0.0]])
    d = jnp.asarray([[-200.0, 0.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, fn, zoom_method="interpolate"
    )
    decrease_ok, curv_ok = _check_wolfe(fn, x, d, alpha, True)
    assert decrease_ok.all() and curv_ok.all()


def test_inactive_elements_keep_zero():
    fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
    x = jnp.asarray([[5.0], [5.0]])
    d = jnp.asarray([[-1.0], [-1.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, fn, active=jnp.asarray([True, False])
    )
    assert float(alpha[1]) == 0.0
    assert float(alpha[0]) > 0.0


def test_jit_compiles(rng):
    fn = lambda x: jnp.sum(jnp.square(x - 1.0), axis=-1)

    @jax.jit
    def search(x):
        err0, g0 = _grad(fn, x)
        return line_search_wolfe_conditions(x, -g0, err0, g0, fn)

    x = jnp.asarray(rng.normal(size=(4, 3)))
    alpha = search(x)
    assert np.all(np.isfinite(alpha))


def test_warm_start_initial_candidate_respects_max_step_size():
    # ADVICE r4: a warm-started first candidate above max_step_size used
    # to be probed (and acceptable) unclipped — only the widening
    # doublings were capped.  On a pure descent direction the strong
    # curvature condition never holds, so every probed candidate is
    # reported; all must sit at or under the cap.
    fn = lambda x: -jnp.sum(x, axis=-1)
    x = jnp.asarray([[0.0]])
    d = jnp.asarray([[1.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_wolfe_conditions(
        x, d, err0, g0, fn,
        max_step_size=2.0,
        max_iterations=8,
        init_alpha=jnp.asarray([8.0]),
    )
    assert float(alpha[0]) <= 2.0


def test_backtracking_init_alpha_is_first_candidate():
    # ADVICE r4: warm_start + backtracking was silently a no-op; the
    # search now accepts an init_alpha.  On a descent direction the first
    # candidate passes Armijo immediately, so the accepted step must be
    # the warm-start value, not 1.
    from davo_tpu.solve.line_search import line_search_backtracking

    fn = lambda x: -jnp.sum(x, axis=-1)
    x = jnp.asarray([[0.0]])
    d = jnp.asarray([[1.0]])
    err0, g0 = _grad(fn, x)
    alpha = line_search_backtracking(
        x, d, err0, g0, fn, init_alpha=jnp.asarray([0.5])
    )
    assert float(alpha[0]) == pytest.approx(0.5)
