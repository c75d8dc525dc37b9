import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    generate_trajectory,
    solve_windowed_vo,
    evaluate_vo,
)
from davo_tpu.train import absolute_trajectory_error, camera_centers_from_poses

CFG = TrajectoryConfig(num_frames=9, num_points=24, window=3)


def test_generated_trajectory_shapes(key):
    poses, points, pixels, visibility = generate_trajectory(key, CFG)
    assert poses.shape == (9, 6)
    assert points.shape == (24, 3)
    assert pixels.shape == (9, 24, 2)
    assert visibility.shape == (9, 24)
    # the cameras orbit at the configured radius
    centres = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    radii = np.linalg.norm(np.asarray(centres)[:, [0, 2]], axis=-1)
    np.testing.assert_allclose(radii, CFG.radius, rtol=1e-5)


def test_cameras_see_most_points(key):
    _, _, _, visibility = generate_trajectory(key, CFG)
    assert float(jnp.mean(visibility.astype(jnp.float32))) > 0.5


def test_windowed_vo_beats_noisy_prior(key):
    poses, points, pixels, visibility = generate_trajectory(key, CFG)
    k = jax.random.fold_in(key, 1)
    estimates = solve_windowed_vo(poses, points, pixels, visibility, CFG, k)
    est_c = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    ate = absolute_trajectory_error(est_c, true_c)
    # the prior has init_noise-scale error; the solve must land far below
    assert float(ate["rmse"]) < 0.01, dict(ate)


def test_evaluate_vo_end_to_end(key):
    ate = evaluate_vo(key, CFG)
    assert set(ate) == {"rmse", "mean", "median", "max"}
    assert float(ate["rmse"]) < 0.01


def test_noisy_pixels_degrade_gracefully(key):
    noisy_cfg = TrajectoryConfig(
        num_frames=9, num_points=24, window=3, pixel_noise=0.002
    )
    ate = evaluate_vo(key, noisy_cfg)
    assert np.isfinite(float(ate["rmse"]))
    assert float(ate["rmse"]) < 0.5
