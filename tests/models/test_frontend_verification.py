"""Eval-time match verification: centroid refinement + gates.

Covers the round-2 additions to the visual front-end
(``models/vo_frontend.py``, ``models/detector.py::refine_points_centroid``)
that turn raw attention regressions into solver-grade observations —
capabilities the reference's WIP front-end never reached
(``networks/modules/feature_match_module.py:34-39``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.data.rendering import (
    RenderConfig,
    render_frame,
    sample_appearance,
)
from davo_tpu.models import VOFrontend
from davo_tpu.models.detector import refine_points_centroid


@pytest.fixture
def rendered_scene(fixed_random_seed):
    key = jax.random.key(fixed_random_seed)
    config = RenderConfig(image_size=64)
    n = 6
    k_pts, k_app, k_noise = jax.random.split(key, 3)
    # keep blobs inside the image and apart from each other
    pts = 1.4 * (jax.random.uniform(k_pts, (n, 2)) - 0.5)
    appearance = sample_appearance(k_app, n, config)
    vis = jnp.ones((n,))
    image = render_frame(pts, vis, appearance, config, k_noise)
    return config, pts, image


def test_centroid_refinement_improves_localisation(rendered_scene):
    config, pts, image = rendered_scene
    key = jax.random.key(7)
    # start ~1 px off (the detector's cell-offset accuracy)
    start = pts + (1.5 / config.image_size) * jax.random.normal(
        key, pts.shape
    )
    refined = refine_points_centroid(
        image[None], start[None], iters=2, radius_px=4
    )[0]
    err_start = jnp.linalg.norm(start - pts, axis=-1)
    err_ref = jnp.linalg.norm(refined - pts, axis=-1)
    assert float(jnp.median(err_ref)) < 0.5 * float(jnp.median(err_start))
    # subpixel: better than half a pixel (2/64 units per pixel)
    assert float(jnp.median(err_ref)) < 1.0 / config.image_size


def test_centroid_refinement_fixed_point(rendered_scene):
    """Starting exactly at the blob centre, refinement must stay put."""
    config, pts, image = rendered_scene
    refined = refine_points_centroid(
        image[None], pts[None], iters=2, radius_px=4
    )[0]
    err = jnp.linalg.norm(refined - pts, axis=-1)
    assert float(jnp.median(err)) < 0.75 / config.image_size


def _frontend_outputs(**kwargs):
    key = jax.random.key(0)
    images = jax.random.uniform(key, (1, 3, 32, 32, 3))
    fe = VOFrontend(num_select=4, descriptor_channels=16,
                    embedding_size=16, **kwargs)
    variables = fe.init({"params": key}, images, training=False)
    return fe.apply(variables, images)


def test_verification_gates_shapes_and_subset():
    base = _frontend_outputs()
    gated = _frontend_outputs(
        snap_radius=0.08, cycle_threshold=0.08, quality_bonus=10.0,
        centroid_refine_iters=1,
    )
    assert gated.matches.shape == base.matches.shape
    assert gated.match_visibility.shape == base.match_visibility.shape
    assert gated.match_visibility.dtype == jnp.bool_
    # the anchor view's own detections always survive snapping
    assert bool(jnp.all(gated.match_visibility[:, 0]))


def test_score_threshold_one_masks_everything():
    out = _frontend_outputs(score_threshold=1.0)
    assert not bool(jnp.any(out.match_visibility))


def test_snap_moves_matches_onto_detections():
    out = _frontend_outputs(snap_radius=10.0)  # everything snaps
    # every surviving match coordinate equals SOME detected feature of its
    # view (snapped), not an attention blend
    pts = np.asarray(out.points)  # (1, M, K, 2)
    matches = np.asarray(out.matches)  # (1, M, N, 2)
    d = np.linalg.norm(
        matches[0, :, :, None, :] - pts[0, :, None, :, :], axis=-1
    ).min(axis=-1)
    assert float(d.max()) < 1e-5
