import jax
import pytest
import jax.numpy as jnp
import numpy as np

from davo_tpu.data import VOWindowConfig, generate_vo_window_batch
from davo_tpu.geometry import rotate_vector_axis_angle

CFG = VOWindowConfig(num_views=4, num_points=8, dtype=jnp.float64)


def test_shapes(key):
    batch = generate_vo_window_batch(key, 6, CFG)
    assert batch.projected_points.shape == (6, 4, 8, 2)
    assert batch.visibility_mask.shape == (6, 4, 8)
    assert batch.camera_intrinsics.shape == (6, 3)
    assert batch.camera_orientations.shape == (6, 3, 3)
    assert batch.camera_translations.shape == (6, 3, 3)
    assert batch.world_points.shape == (6, 8, 3)


def test_projections_consistent_with_parameters(key):
    batch = generate_vo_window_batch(key, 4, CFG)
    b = 0
    wp = batch.world_points[b]
    f, cx, cy = np.asarray(batch.camera_intrinsics[b])
    # view 0 = identity frame
    u = f * np.asarray(wp[:, 0]) / np.asarray(wp[:, 2]) + cx
    v = f * np.asarray(wp[:, 1]) / np.asarray(wp[:, 2]) + cy
    vis0 = np.asarray(batch.visibility_mask[b, 0])
    np.testing.assert_allclose(
        np.asarray(batch.projected_points[b, 0])[vis0],
        np.stack([u, v], -1)[vis0],
        rtol=1e-6,
        atol=1e-8,
    )
    for m in range(3):
        rel = np.asarray(
            rotate_vector_axis_angle(wp, batch.camera_orientations[b, m])
            + batch.camera_translations[b, m]
        )
        vis = np.asarray(batch.visibility_mask[b, m + 1])
        if not vis.any():
            continue
        u = f * rel[:, 0] / rel[:, 2] + cx
        v = f * rel[:, 1] / rel[:, 2] + cy
        np.testing.assert_allclose(
            np.asarray(batch.projected_points[b, m + 1])[vis],
            np.stack([u, v], -1)[vis],
            rtol=1e-5,
            atol=1e-7,
        )


def test_wide_baselines(key):
    # consecutive keyframes should be separated by meaningful baselines
    batch = generate_vo_window_batch(key, 16, CFG)
    t = np.asarray(batch.camera_translations)
    baselines = np.linalg.norm(t[:, 0], axis=-1)
    assert baselines.mean() > 0.3  # radius >= 8, step >= 0.05 rad


def test_visibility_reasonable(key):
    batch = generate_vo_window_batch(key, 16, CFG)
    assert float(jnp.mean(batch.visibility_mask.astype(jnp.float32))) > 0.4


def test_jit_and_determinism(key):
    fn = jax.jit(lambda k: generate_vo_window_batch(k, 4, CFG))
    b1, b2 = fn(key), fn(key)
    np.testing.assert_array_equal(b1.projected_points, b2.projected_points)


@pytest.mark.slow
def test_training_harness_integration(key):
    import dataclasses
    from davo_tpu.solve import BFGSConfig
    from davo_tpu.train import CalibrationExperiment, create_train_state, make_train_step

    cfg = CalibrationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=16,
        batch_size=4,
        data_source="vo_windows",
        schedule="constant",
        solver=BFGSConfig(
            error_threshold=1e-7,
            iterations=3,
            training_iterations=1,
            drop_path_p=0.0,
            line_search_iterations=6,
        ),
    )
    network, state = create_train_state(cfg, key)
    step = make_train_step(network, cfg)
    _, metrics = step(state, jax.random.fold_in(key, 1))
    assert np.isfinite(float(metrics["loss"]))


def test_verified_match_augmentation(key):
    """visibility_dropout + outlier_fraction model the verified-match
    distribution: anchor view untouched, other views lose observations
    and gain a few wrong-but-visible assignments."""
    import dataclasses

    from davo_tpu.data import VOWindowConfig, generate_vo_window_batch

    clean_cfg = VOWindowConfig(num_views=4, num_points=8)
    aug_cfg = dataclasses.replace(
        clean_cfg, visibility_dropout=0.8, outlier_fraction=0.1
    )
    clean = generate_vo_window_batch(key, 64, clean_cfg)
    aug = generate_vo_window_batch(key, 64, aug_cfg)

    # scene geometry identical (same key): true params unchanged
    assert jnp.allclose(clean.camera_intrinsics, aug.camera_intrinsics)
    assert jnp.allclose(clean.world_points, aug.world_points)

    # anchor view clean: same visibility, same pixels
    assert jnp.array_equal(
        clean.visibility_mask[:, 0], aug.visibility_mask[:, 0]
    )
    assert jnp.allclose(
        clean.projected_points[:, 0], aug.projected_points[:, 0]
    )

    # non-anchor views: visibility only ever drops, and drops a lot on
    # average (d ~ U(0, 0.8) -> mean 40% of visible obs dropped)
    assert bool(jnp.all(aug.visibility_mask <= clean.visibility_mask))
    kept = aug.visibility_mask[:, 1:].sum() / jnp.maximum(
        clean.visibility_mask[:, 1:].sum(), 1
    )
    assert 0.3 < float(kept) < 0.85

    # outliers: some still-visible non-anchor pixels moved to another
    # point's projection (clean pixels elsewhere in the same view)
    moved = (
        jnp.abs(aug.projected_points - clean.projected_points).max(-1) > 1e-6
    ) & clean.visibility_mask
    frac = moved[:, 1:].sum() / jnp.maximum(
        clean.visibility_mask[:, 1:].sum(), 1
    )
    assert 0.02 < float(frac) < 0.25
    assert not bool(moved[:, 0].any())
