"""Synthetic image renderer: geometry, determinism, jit."""

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.data.rendering import (
    RenderConfig,
    render_frame,
    render_views,
    sample_appearance,
)


def _config(**kw):
    return RenderConfig(image_size=32, **kw)


def test_blob_renders_at_projection(rng):
    config = _config()
    key = jax.random.key(rng.integers(1 << 30))
    appearance = sample_appearance(key, 1, config)
    proj = jnp.asarray([[0.5, -0.25]])
    vis = jnp.ones(1)
    image = render_frame(proj, vis, appearance, config)
    assert image.shape == (32, 32, 3)
    total = jnp.sum(image, axis=-1)
    iy, ix = np.unravel_index(int(jnp.argmax(total)), total.shape)
    # pixel centre closest to (u, v) = (0.5, -0.25)
    u = (ix + 0.5) / 32 * 2 - 1
    v = (iy + 0.5) / 32 * 2 - 1
    # the ripple pattern can shift the brightest pixel off-centre by a
    # blob radius; localise coarsely
    assert abs(u - 0.5) < 0.2 and abs(v + 0.25) < 0.2


def test_invisible_points_render_nothing(rng):
    config = _config()
    key = jax.random.key(rng.integers(1 << 30))
    appearance = sample_appearance(key, 3, config)
    proj = jnp.asarray([[0.0, 0.0], [0.5, 0.5], [-0.5, 0.2]])
    image = render_frame(proj, jnp.zeros(3), appearance, config)
    np.testing.assert_allclose(np.asarray(image), 0.0)


def test_same_appearance_across_views(rng):
    # the same point at two locations renders the same pattern (shifted)
    config = _config()
    key = jax.random.key(rng.integers(1 << 30))
    appearance = sample_appearance(key, 1, config)
    vis = jnp.ones(1)
    a = render_frame(jnp.asarray([[0.0, 0.0]]), vis, appearance, config)
    b = render_frame(jnp.asarray([[0.25, 0.0]]), vis, appearance, config)
    # shift b back by 4 pixels (0.25 of [-1,1] over 32 px) and compare
    shifted = jnp.roll(b, -4, axis=1)
    # interiors match; edges differ by the rolled-in region
    np.testing.assert_allclose(
        np.asarray(shifted[8:24, 8:24]), np.asarray(a[8:24, 8:24]), atol=1e-4
    )


def test_render_views_jits_and_noise_is_deterministic(rng):
    config = _config()
    key = jax.random.key(rng.integers(1 << 30))
    appearance = sample_appearance(key, 4, config)
    proj = jax.random.uniform(key, (3, 4, 2), minval=-0.8, maxval=0.8)
    vis = jnp.ones((3, 4))
    render = jax.jit(
        lambda p, v, a, k: render_views(p, v, a, config, k),
    )
    k2 = jax.random.fold_in(key, 1)
    img1 = render(proj, vis, appearance, k2)
    img2 = render(proj, vis, appearance, k2)
    assert img1.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert np.all(np.isfinite(np.asarray(img1)))
