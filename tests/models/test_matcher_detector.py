import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.models import (
    FeatureMatchModule,
    NFoldMatcherModule,
    FeatureDetectionModule,
)
from davo_tpu.types import FeaturePoints


def _features(rng, k=6, d=8, batch=2):
    return FeaturePoints(
        points=jnp.asarray(rng.uniform(-1, 1, size=(batch, k, 2))),
        descriptors=jnp.asarray(rng.normal(size=(batch, k, d))),
    )


class TestFeatureMatch:
    def test_shapes(self, rng, key):
        fa, fb = _features(rng), _features(rng)
        module = FeatureMatchModule(descriptor_size=8)
        variables = module.init({"params": key}, fa, fb)
        out = module.apply(variables, fa, fb)
        assert out.points_a.shape == (2, 6, 2)
        assert out.points_b.shape == (2, 6, 2)
        np.testing.assert_array_equal(out.points_a, fa.points)

    def test_matched_points_in_convex_hull_of_b(self, rng, key):
        fa, fb = _features(rng), _features(rng)
        module = FeatureMatchModule(descriptor_size=8)
        variables = module.init({"params": key}, fa, fb)
        out = module.apply(variables, fa, fb)
        # attention-weighted coordinates are convex combinations of B's points
        lo = np.asarray(fb.points).min(axis=1, keepdims=True)
        hi = np.asarray(fb.points).max(axis=1, keepdims=True)
        assert np.all(np.asarray(out.points_b) >= lo - 1e-6)
        assert np.all(np.asarray(out.points_b) <= hi + 1e-6)

    def test_identical_descriptors_match_to_same_point(self, rng, key):
        # With sharply distinct descriptors and identical projections for
        # a and b, attention should recover approximately b's points.
        d = 16
        desc = 10.0 * jnp.eye(d)[None, :6, :]
        pa = jnp.asarray(rng.uniform(-1, 1, size=(1, 6, 2)))
        pb = jnp.asarray(rng.uniform(-1, 1, size=(1, 6, 2)))
        fa = FeaturePoints(points=pa, descriptors=desc)
        fb = FeaturePoints(points=pb, descriptors=desc)
        module = FeatureMatchModule(descriptor_size=d)
        variables = module.init({"params": key}, fa, fb)
        # Force identity projections so similarity is descriptor identity.
        eye_params = jax.tree_util.tree_map(lambda x: x, variables)
        eye = jnp.eye(d)
        eye_params = {
            "params": {
                "query": {"kernel": eye, "bias": jnp.zeros(d)},
                "key": {"kernel": eye, "bias": jnp.zeros(d)},
            }
        }
        out = module.apply(eye_params, fa, fb)
        np.testing.assert_allclose(out.points_b, pb, atol=1e-2)

    def test_dropout_only_in_training(self, rng, key):
        fa, fb = _features(rng), _features(rng)
        module = FeatureMatchModule(descriptor_size=8, dropout=0.5)
        variables = module.init({"params": key}, fa, fb)
        out1 = module.apply(variables, fa, fb)
        out2 = module.apply(variables, fa, fb)
        np.testing.assert_array_equal(out1.points_b, out2.points_b)
        t1 = module.apply(
            variables, fa, fb, training=True, rngs={"dropout": key}
        )
        t2 = module.apply(
            variables,
            fa,
            fb,
            training=True,
            rngs={"dropout": jax.random.fold_in(key, 1)},
        )
        assert not np.allclose(t1.points_b, t2.points_b)


class TestNFoldMatcher:
    def test_matches_anchor_to_each_view(self, rng, key):
        anchor = _features(rng)
        others = [_features(rng), _features(rng), _features(rng)]
        module = NFoldMatcherModule(descriptor_size=8)
        variables = module.init({"params": key}, anchor, others)
        outs = module.apply(variables, anchor, others)
        assert len(outs) == 3
        for out in outs:
            np.testing.assert_array_equal(out.points_a, anchor.points)


class TestFeatureDetection:
    def test_shapes_and_finite(self, rng, key):
        image = jnp.asarray(rng.normal(size=(2, 64, 64, 3)))
        module = FeatureDetectionModule(descriptor_channels=16)
        variables = module.init({"params": key}, image)
        out = module.apply(variables, image)
        b, k, two = out.points.shape
        assert b == 2 and two == 2 and k > 0
        assert out.descriptors.shape == (2, k, 16)
        assert np.all(np.isfinite(out.points))
        assert np.all(np.isfinite(out.descriptors))

    def test_training_mode_updates_batch_stats(self, rng, key):
        image = jnp.asarray(rng.normal(size=(2, 64, 64, 3)))
        module = FeatureDetectionModule(descriptor_channels=8)
        variables = module.init({"params": key}, image)
        _, mutated = module.apply(
            variables, image, training=True, mutable=["batch_stats"]
        )
        assert "batch_stats" in mutated
