"""Tests for utils/precision.py (full_f32_matmuls decorator)."""

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.utils import full_f32_matmuls


def test_wrapped_function_matches_unwrapped_on_cpu():
    # On CPU the precision context is a no-op; results must be identical.
    a = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)), jnp.float32)

    def f(x):
        return x @ x.T

    np.testing.assert_array_equal(full_f32_matmuls(f)(a), f(a))


def test_precision_context_active_during_trace():
    seen = []

    @full_f32_matmuls
    def f(x):
        seen.append(jax.config.jax_default_matmul_precision)
        return x * 2.0

    f(jnp.ones(3))
    assert seen == ["highest"]
    # and restored afterwards
    assert jax.config.jax_default_matmul_precision != "highest"


def test_decorator_preserves_metadata_and_kwargs():
    @full_f32_matmuls
    def scale(x, factor=2.0):
        return x * factor

    assert scale.__name__ == "scale"
    np.testing.assert_allclose(scale(jnp.ones(2), factor=3.0), 3.0 * np.ones(2))
