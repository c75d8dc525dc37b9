"""VOFrontend: shapes, selection semantics, and matcher correctness on a
constructed scene (the VERDICT-requested property test)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from davo_tpu.models import (
    FeatureDetectionModule,
    FeatureMatchModule,
    VOFrontend,
    select_matches,
)
from davo_tpu.types import FeaturePoints


def test_detector_emits_scores_and_bounded_offsets(rng):
    key = jax.random.key(rng.integers(1 << 30))
    module = FeatureDetectionModule(descriptor_channels=8)
    image = jax.random.uniform(key, (2, 32, 32, 3))
    variables = module.init({"params": key}, image)
    feats = module.apply(variables, image)
    k = (32 // 8) ** 2
    assert feats.points.shape == (2, k, 2)
    assert feats.scores.shape == (2, k)
    assert feats.descriptors.shape == (2, k, 8)
    # every coordinate stays within its cell centre +- 1.5 cells, hence
    # strictly inside [-1 - eps, 1 + eps]
    cell = 2.0 / (32 // 8)
    assert np.all(np.abs(np.asarray(feats.points)) <= 1.0 + 1.5 * cell)


def test_select_matches_picks_top_scores():
    matched = jnp.arange(2 * 3 * 5 * 2, dtype=jnp.float32).reshape(2, 3, 5, 2)
    matched = matched / matched.max()  # keep in bounds
    scores = jnp.asarray(
        [[0.1, 5.0, -2.0, 3.0, 0.2], [9.0, 0.0, 8.0, -1.0, 7.0]]
    )
    matches, vis, idx = select_matches(matched, scores, 2)
    np.testing.assert_array_equal(np.asarray(idx), [[1, 3], [0, 2]])
    assert matches.shape == (2, 3, 2, 2)
    np.testing.assert_array_equal(
        np.asarray(matches[0, 0]), np.asarray(matched[0, 0, [1, 3]])
    )
    np.testing.assert_array_equal(
        np.asarray(matches[1, 2]), np.asarray(matched[1, 2, [0, 2]])
    )
    assert vis.shape == (2, 3, 2)


def test_select_matches_flags_out_of_bounds():
    matched = jnp.zeros((1, 2, 4, 2)).at[0, 1, 0, 0].set(2.0)
    scores = jnp.asarray([[4.0, 3.0, 2.0, 1.0]])
    _, vis, _ = select_matches(matched, scores, 2)
    assert not bool(vis[0, 1, 0])  # u = 2 out of bounds
    assert bool(vis[0, 0, 0]) and bool(vis[0, 1, 1])


def test_matcher_finds_correct_match_on_constructed_scene():
    """With identity query/key projections and near-orthogonal descriptors,
    the attention matcher must return (approximately) the coordinates of
    the descriptor-matching feature — matching by appearance, not order."""
    k, d = 6, 32
    # scaled orthonormal descriptors: softmax(q k^T / sqrt(d)) concentrates
    # on the matching feature
    desc = 40.0 * jnp.eye(k, d)
    pts_a = jnp.linspace(-0.9, 0.9, k)[:, None] * jnp.ones((1, 2))
    perm = jnp.asarray([3, 0, 5, 1, 4, 2])
    pts_b = pts_a[perm] + 0.05
    feats_a = FeaturePoints(points=pts_a[None], descriptors=desc[None])
    feats_b = FeaturePoints(
        points=pts_b[None], descriptors=desc[perm][None]
    )
    module = FeatureMatchModule(descriptor_size=d, dropout=0.0)
    variables = module.init(
        {"params": jax.random.key(0)}, feats_a, feats_b
    )
    # inject identity projections so attention runs on raw descriptors
    eye = jnp.eye(d)
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    params["query"] = {"kernel": eye, "bias": jnp.zeros(d)}
    params["key"] = {"kernel": eye, "bias": jnp.zeros(d)}
    out = module.apply({"params": params}, feats_a, feats_b)
    # feature i in A carries descriptor e_i; its match in B is the feature
    # with the same descriptor, which sits at pts_a[i] + 0.05
    expected = pts_a + 0.05
    np.testing.assert_allclose(
        np.asarray(out.points_b[0]), np.asarray(expected), atol=1e-3
    )


def test_nms_selection_suppresses_duplicates():
    # two clusters of features; without NMS the top-2 are both from the
    # high-score cluster, with NMS the second pick jumps clusters
    anchor = jnp.asarray(
        [[[0.0, 0.0], [0.01, 0.0], [0.5, 0.5], [0.52, 0.5]]]
    )  # (1, 4, 2)
    matched = jnp.broadcast_to(anchor[:, None], (1, 2, 4, 2))
    scores = jnp.asarray([[10.0, 9.0, 5.0, 4.0]])
    _, _, idx_plain = select_matches(matched, scores, 2)
    np.testing.assert_array_equal(np.asarray(idx_plain[0]), [0, 1])
    _, _, idx_nms = select_matches(matched, scores, 2, nms_radius=0.1)
    np.testing.assert_array_equal(np.asarray(idx_nms[0]), [0, 2])


def test_confidence_gating_masks_ambiguous_matches(rng):
    key = jax.random.key(rng.integers(1 << 30))
    images = jax.random.uniform(key, (1, 3, 32, 32, 3))
    gated = VOFrontend(
        num_select=4,
        descriptor_channels=8,
        embedding_size=8,
        match_confidence_threshold=0.9,  # untrained attention is ~uniform
    )
    variables = gated.init({"params": key}, images)
    out = gated.apply(variables, images)
    assert out.confidence is not None
    assert out.confidence.shape == (1, 3, (32 // 8) ** 2)
    np.testing.assert_allclose(np.asarray(out.confidence[:, 0]), 1.0)
    # untrained attention over 16 keys peaks far below 0.9: every
    # non-anchor match must be gated out; the anchor view stays visible
    assert not np.any(np.asarray(out.match_visibility[:, 1:]))
    assert np.all(np.asarray(out.match_visibility[:, 0]))
    ungated = VOFrontend(
        num_select=4, descriptor_channels=8, embedding_size=8
    )
    out2 = ungated.apply(variables, images)
    assert out2.confidence is None
    assert np.any(np.asarray(out2.match_visibility[:, 1:]))


@pytest.mark.slow
def test_frontend_shapes_and_grads(rng):
    key = jax.random.key(rng.integers(1 << 30))
    net = VOFrontend(num_select=4, descriptor_channels=8, embedding_size=8)
    images = jax.random.uniform(key, (2, 3, 32, 32, 3))
    variables = net.init({"params": key}, images)
    out = net.apply(variables, images)
    k = (32 // 8) ** 2
    assert out.points.shape == (2, 3, k, 2)
    assert out.scores.shape == (2, 3, k)
    assert out.matched.shape == (2, 3, k, 2)
    assert out.matches.shape == (2, 3, 4, 2)
    assert out.match_visibility.shape == (2, 3, 4)
    # anchor view's matched coords are its own detected points
    np.testing.assert_array_equal(
        np.asarray(out.matched[:, 0]), np.asarray(out.points[:, 0])
    )

    def loss(params):
        o = net.apply({"params": params, **{
            name: v for name, v in variables.items() if name != "params"
        }}, images)
        return jnp.sum(jnp.square(o.matched)) + jnp.sum(o.scores**2)

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
