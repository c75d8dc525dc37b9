import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from davo_tpu.utils import (
    inverse_curvature,
    interpolate_alpha,
    project_vector_onto_axis,
    safe_reciprocal,
)


class TestSafeReciprocal:
    def test_values(self):
        x = jnp.asarray([2.0, -4.0, 0.0, 0.5])
        np.testing.assert_allclose(safe_reciprocal(x), [0.5, -0.25, 0.0, 2.0])

    def test_grad_zero_at_zero(self):
        g = jax.grad(safe_reciprocal)(0.0)
        assert g == 0.0

    def test_grads(self):
        x = jnp.asarray([2.0, -4.0, 0.5])
        check_grads(safe_reciprocal, (x,), order=2, atol=1e-6, rtol=1e-6)


class TestInverseCurvature:
    def test_positive_curvature(self, rng):
        step = jnp.asarray(rng.normal(size=(8, 5)))
        delta = step + 0.1 * jnp.asarray(rng.normal(size=(8, 5)))
        expected = 1.0 / np.sum(np.asarray(step) * np.asarray(delta), axis=-1)
        result = inverse_curvature(step, delta)
        assert result.shape == (8, 1)
        pos = expected > 0
        np.testing.assert_allclose(result[pos, 0], expected[pos], rtol=1e-10)

    def test_nonpositive_curvature_returns_zero(self):
        step = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
        delta = jnp.asarray([[-1.0, 0.0], [0.0, 0.0]])
        result = inverse_curvature(step, delta)
        np.testing.assert_array_equal(result, np.zeros((2, 1)))

    def test_gradients_positive_branch(self, rng):
        step = jnp.asarray(rng.normal(size=(4, 3)))
        delta = step * 0.5  # strictly positive curvature
        check_grads(inverse_curvature, (step, delta), order=1, atol=1e-5, rtol=1e-5)

    def test_gradients_zero_on_skipped_branch(self):
        step = jnp.asarray([[1.0, 1.0]])
        delta = jnp.asarray([[-1.0, 0.0]])
        g = jax.grad(lambda s, d: inverse_curvature(s, d).sum(), argnums=(0, 1))(
            step, delta
        )
        np.testing.assert_array_equal(g[0], np.zeros_like(step))
        np.testing.assert_array_equal(g[1], np.zeros_like(delta))


class TestInterpolateAlpha:
    def test_secant_finds_linear_zero(self):
        # values linear in alpha: v = 2*(alpha - 3); zero at alpha = 3.
        a1, a2 = jnp.asarray(1.0), jnp.asarray(5.0)
        v1, v2 = 2.0 * (a1 - 3.0), 2.0 * (a2 - 3.0)
        out = interpolate_alpha(a1, a2, v1, v2)
        np.testing.assert_allclose(out, 3.0, rtol=1e-12)

    def test_bisection_on_equal_values(self):
        out = interpolate_alpha(
            jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(2.0), jnp.asarray(2.0)
        )
        np.testing.assert_allclose(out, 3.0)

    def test_bisection_when_secant_outside_range(self):
        # Both values positive: secant extrapolates below the lower bound.
        out = interpolate_alpha(
            jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(1.0), jnp.asarray(9.0)
        )
        np.testing.assert_allclose(out, 3.0)

    def test_bisection_when_secant_hugs_bound(self):
        # Zero crossing within 1e-3 of the lower bound -> bisect.
        a1, a2 = jnp.asarray(1.0), jnp.asarray(2.0)
        v1, v2 = jnp.asarray(-1e-6), jnp.asarray(1.0)
        np.testing.assert_allclose(interpolate_alpha(a1, a2, v1, v2), 1.5)

    def test_gradients_secant_branch(self):
        args = (jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(-4.0), jnp.asarray(4.0))
        check_grads(interpolate_alpha, args, order=1, atol=1e-5, rtol=1e-5)

    def test_gradients_bisection_branch(self):
        args = (jnp.asarray(1.0), jnp.asarray(5.0), jnp.asarray(2.0), jnp.asarray(2.0))
        g = jax.grad(interpolate_alpha, argnums=(0, 1, 2, 3))(*args)
        np.testing.assert_allclose(g[0], 0.5)
        np.testing.assert_allclose(g[1], 0.5)
        np.testing.assert_allclose(g[2], 0.0)
        np.testing.assert_allclose(g[3], 0.0)

    def test_batched(self, rng):
        a1 = jnp.asarray(rng.uniform(0.0, 1.0, size=(16,)))
        a2 = a1 + jnp.asarray(rng.uniform(1.0, 2.0, size=(16,)))
        v1 = jnp.asarray(rng.normal(size=(16,)))
        v2 = jnp.asarray(rng.normal(size=(16,)))
        out = interpolate_alpha(a1, a2, v1, v2)
        assert out.shape == (16,)
        assert np.all(out >= np.minimum(a1, a2)) and np.all(out <= np.maximum(a1, a2))


class TestProjectVectorOntoAxis:
    def test_matches_formula(self, rng):
        v = jnp.asarray(rng.normal(size=(8, 3)))
        a = jnp.asarray(rng.normal(size=(8, 3)))
        out = project_vector_onto_axis(v, a)
        expected = (
            np.sum(np.asarray(v) * np.asarray(a), axis=-1, keepdims=True)
            / np.sum(np.asarray(a) ** 2, axis=-1, keepdims=True)
        ) * np.asarray(a)
        np.testing.assert_allclose(out, expected, rtol=1e-10)

    def test_zero_axis_gives_zero(self):
        v = jnp.asarray([[1.0, 2.0, 3.0]])
        a = jnp.zeros((1, 3))
        out = project_vector_onto_axis(v, a)
        np.testing.assert_array_equal(out, np.zeros((1, 3)))
        g = jax.grad(lambda vv: project_vector_onto_axis(vv, a).sum())(v)
        np.testing.assert_array_equal(g, np.zeros((1, 3)))

    def test_projection_onto_parallel_axis_is_identity(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 3)))
        out = project_vector_onto_axis(2.5 * a, a)
        np.testing.assert_allclose(out, 2.5 * np.asarray(a), rtol=1e-10)

    def test_gradients(self, rng):
        v = jnp.asarray(rng.normal(size=(4, 3)))
        a = jnp.asarray(rng.normal(size=(4, 3))) + 0.5
        check_grads(
            lambda vv, aa: project_vector_onto_axis(vv, aa),
            (v, a),
            order=1,
            atol=1e-5,
            rtol=1e-5,
        )

    def test_precomputed_square_norm(self, rng):
        v = jnp.asarray(rng.normal(size=(4, 3)))
        a = jnp.asarray(rng.normal(size=(4, 3)))
        n = jnp.sum(jnp.square(a), axis=-1, keepdims=True)
        np.testing.assert_allclose(
            project_vector_onto_axis(v, a, n),
            project_vector_onto_axis(v, a),
            rtol=1e-12,
        )
