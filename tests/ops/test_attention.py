"""Flash attention kernel vs the reference jnp implementation.

On CPU the Pallas kernel runs in interpreter mode, exercising the same
online-softmax block logic that compiles on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.ops import flash_match_attention
from davo_tpu.ops.attention import _reference_attention


@pytest.mark.parametrize(
    "q_len,kv_len,d,c",
    [
        (16, 16, 8, 2),       # tiny, everything padded
        (128, 128, 64, 64),   # exactly one block
        (130, 260, 32, 16),   # ragged: padding + multiple kv blocks
    ],
)
def test_matches_reference(rng, q_len, kv_len, d, c):
    q = jnp.asarray(rng.normal(size=(2, q_len, d)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, kv_len, d)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, kv_len, c)), dtype=jnp.float32)
    out = flash_match_attention(q, k, v, interpret=True)
    expected = _reference_attention(q, k, v)
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)


def test_large_logits_stable(rng):
    # online softmax must not overflow with large score magnitudes
    q = 30.0 * jnp.asarray(rng.normal(size=(1, 16, 8)), dtype=jnp.float32)
    k = 30.0 * jnp.asarray(rng.normal(size=(1, 16, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 16, 4)), dtype=jnp.float32)
    out = flash_match_attention(q, k, v, interpret=True)
    assert np.all(np.isfinite(out))
    expected = _reference_attention(q, k, v)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_attention_weights_are_convex(rng):
    # outputs lie in the convex hull of the values
    q = jnp.asarray(rng.normal(size=(1, 20, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 36, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 36, 3)), dtype=jnp.float32)
    out = np.asarray(flash_match_attention(q, k, v, interpret=True))
    lo = np.asarray(v).min(axis=1, keepdims=True)
    hi = np.asarray(v).max(axis=1, keepdims=True)
    assert np.all(out >= lo - 1e-5) and np.all(out <= hi + 1e-5)


@pytest.mark.parametrize("q_len,kv_len", [(40, 300), (256, 384)])
def test_mask_matches_reference(rng, q_len, kv_len):
    # key-validity mask spanning multiple kv blocks, incl. a fully-masked
    # block in the middle
    q = jnp.asarray(rng.normal(size=(2, q_len, 16)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, kv_len, 16)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, kv_len, 8)), dtype=jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(2, kv_len)) > 0.4)
    if kv_len >= 256:  # kill the whole second kv block
        mask = mask.at[:, 128:256].set(False)
    out = flash_match_attention(q, k, v, mask, interpret=True)
    expected = _reference_attention(q, k, v, mask)
    np.testing.assert_allclose(out, expected, rtol=2e-5, atol=2e-5)


def test_fully_masked_rows_return_zero(rng):
    q = jnp.asarray(rng.normal(size=(1, 8, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 12, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 12, 4)), dtype=jnp.float32)
    mask = jnp.zeros((1, 12), dtype=bool)
    out = flash_match_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(out, np.zeros_like(out))


def test_kv_blocking_is_length_invariant(rng):
    # splitting the kv stream into more blocks must not change the result
    q = jnp.asarray(rng.normal(size=(1, 64, 8)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 512, 8)), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 512, 4)), dtype=jnp.float32)
    big = flash_match_attention(q, k, v, block_k=512, interpret=True)
    small = flash_match_attention(q, k, v, block_k=128, interpret=True)
    np.testing.assert_allclose(big, small, rtol=2e-6, atol=2e-6)
