import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.data import SceneConfig, generate_batch, generate_scene
from davo_tpu.geometry import rotate_vector_axis_angle

CFG = SceneConfig(num_views=4, num_points=8, dtype=jnp.float64)


def test_shapes(key):
    batch = generate_batch(key, 6, CFG)
    assert batch.projected_points.shape == (6, 4, 8, 2)
    assert batch.visibility_mask.shape == (6, 4, 8)
    assert batch.camera_intrinsics.shape == (6, 3)
    assert batch.camera_orientations.shape == (6, 3, 3)
    assert batch.camera_translations.shape == (6, 3, 3)
    assert batch.world_points.shape == (6, 8, 3)


def test_world_points_in_front_of_first_view(key):
    batch = generate_batch(key, 8, CFG)
    assert np.all(np.asarray(batch.world_points[..., 2]) > 0.0)


def test_intrinsics_ranges(key):
    batch = generate_batch(key, 32, CFG)
    f = np.asarray(batch.camera_intrinsics[:, 0])
    # FOV in [30, 120] deg: f = 1/tan(fov/2) in [1/tan(60deg), 1/tan(15deg)]
    assert np.all(f >= 1.0 / np.tan(np.pi / 3) - 1e-6)
    assert np.all(f <= 1.0 / np.tan(np.pi / 12) + 1e-6)
    c = np.asarray(batch.camera_intrinsics[:, 1:])
    assert np.all(np.abs(c) <= 0.5)


def test_projections_consistent_with_parameters(key):
    batch = generate_batch(key, 4, CFG)
    b = 0
    wp = batch.world_points[b]
    # view 0 is the identity: project directly
    f, cx, cy = np.asarray(batch.camera_intrinsics[b])
    u = f * np.asarray(wp[:, 0]) / np.asarray(wp[:, 2]) + cx
    v = f * np.asarray(wp[:, 1]) / np.asarray(wp[:, 2]) + cy
    np.testing.assert_allclose(
        batch.projected_points[b, 0], np.stack([u, v], -1), rtol=1e-6, atol=1e-8
    )
    # other views: rotate + translate then project
    for m in range(3):
        rel = (
            rotate_vector_axis_angle(wp, batch.camera_orientations[b, m])
            + batch.camera_translations[b, m]
        )
        rel = np.asarray(rel)
        vis = np.asarray(batch.visibility_mask[b, m + 1])
        if not vis.any():
            continue
        u = f * rel[:, 0] / np.maximum(rel[:, 2], 1e-8) + cx
        v = f * rel[:, 1] / np.maximum(rel[:, 2], 1e-8) + cy
        np.testing.assert_allclose(
            np.asarray(batch.projected_points[b, m + 1])[vis],
            np.stack([u, v], -1)[vis],
            rtol=1e-5,
            atol=1e-7,
        )


def test_visibility_matches_bounds(key):
    batch = generate_batch(key, 8, CFG)
    uv = np.asarray(batch.projected_points)
    in_bounds = np.all((uv > -1.0) & (uv < 1.0), axis=-1)
    vis = np.asarray(batch.visibility_mask)
    # visibility implies in-bounds (depth can still cull)
    assert np.all(~vis | in_bounds)


def test_first_view_sees_most_points(key):
    batch = generate_batch(key, 16, CFG)
    vis = np.asarray(batch.visibility_mask)
    # view 1 looks straight at the point cloud centre
    assert vis[:, 0].mean() > 0.5


def test_min_camera_distance_respected(key):
    cfg = SceneConfig(num_views=5, num_points=10, min_camera_distance=0.1)
    batch = generate_batch(key, 8, cfg)
    for b in range(8):
        for m in range(4):
            rel = np.asarray(
                rotate_vector_axis_angle(
                    batch.world_points[b], batch.camera_orientations[b, m]
                )
                + batch.camera_translations[b, m]
            )
            assert rel[:, 2].min() >= cfg.min_camera_distance - 1e-4


def test_deterministic_given_key(key):
    b1 = generate_batch(key, 2, CFG)
    b2 = generate_batch(key, 2, CFG)
    np.testing.assert_array_equal(b1.projected_points, b2.projected_points)


def test_jit_compiles(key):
    fn = jax.jit(lambda k: generate_batch(k, 4, CFG))
    batch = fn(key)
    assert np.all(np.isfinite(batch.projected_points))
