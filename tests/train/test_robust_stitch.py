"""Robust (Huber-IRLS) window stitching.

The learned-matches campaign measured single catastrophic window solves
poisoning the whole trajectory through the global least-squares coupling
(ROADMAP round 2); ``stitch_windows_global(robust=True)`` downweights
outlier edges with a percentile-based Huber scale (with absolute
floors) and hard-gates known-bad windows out of the centre solve so the
damage stays local.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.geometry import so3_rotation_matrix, axis_angle_from_matrix
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
)
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    generate_trajectory,
    stitch_windows_global,
    _window_starts,
)


@pytest.fixture
def key(fixed_random_seed):
    return jax.random.key(fixed_random_seed)


def _exact_window_poses(poses, starts, w, key):
    """Window-relative poses with random per-window gauge scales."""
    rots = so3_rotation_matrix(poses[:, 0:3])
    centres = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    out = []
    for wi, s in enumerate(starts):
        scale = 1.0 + 0.4 * float(
            jax.random.uniform(jax.random.fold_in(key, wi))
        )
        rows = []
        for j in range(w):
            r_rel = rots[s + j] @ rots[s].T
            c_rel = scale * (rots[s] @ (centres[s + j] - centres[s]))
            t_rel = -r_rel @ c_rel
            rows.append(
                jnp.concatenate([axis_angle_from_matrix(r_rel), t_rel])
            )
        out.append(jnp.stack(rows))
    return out


def _ate(estimates, poses):
    est_c = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    return float(absolute_trajectory_error(est_c, true_c)["rmse"])


@pytest.mark.slow
def test_robust_stitch_confines_catastrophic_window(key):
    cfg = TrajectoryConfig(num_frames=14, num_points=16, window=4, stride=1)
    poses, _, _, _ = generate_trajectory(key, cfg)
    starts = _window_starts(cfg.num_frames, cfg.window, 1)
    window_poses = _exact_window_poses(poses, starts, cfg.window, key)

    # corrupt ONE middle window catastrophically (~60 deg, wrong t)
    bad = len(starts) // 2
    corrupt = window_poses[bad] + jnp.asarray([0.7, -0.8, 0.5, 2.0, -1.5, 1.0])
    corrupt = corrupt.at[0].set(jnp.zeros(6))  # anchor stays identity
    window_poses = list(window_poses)
    window_poses[bad] = corrupt

    plain = stitch_windows_global(starts, window_poses, cfg.num_frames)
    robust = stitch_windows_global(
        starts, window_poses, cfg.num_frames, robust=True
    )
    ate_plain = _ate(plain, poses)
    ate_robust = _ate(robust, poses)
    # stride 1 gives every non-anchor frame several clean edges: robust
    # weighting must confine the corrupted window's influence
    assert ate_robust < 0.5 * ate_plain, (ate_robust, ate_plain)
    assert ate_robust < 0.2, (ate_robust, ate_plain)


def test_robust_matches_plain_on_clean_windows(key):
    cfg = TrajectoryConfig(num_frames=12, num_points=16, window=4)
    poses, _, _, _ = generate_trajectory(key, cfg)
    starts = _window_starts(cfg.num_frames, cfg.window, cfg.window - 2)
    window_poses = _exact_window_poses(poses, starts, cfg.window, key)
    plain = stitch_windows_global(starts, window_poses, cfg.num_frames)
    robust = stitch_windows_global(
        starts, window_poses, cfg.num_frames, robust=True
    )
    assert _ate(plain, poses) < 1e-4
    assert _ate(robust, poses) < 1e-4
