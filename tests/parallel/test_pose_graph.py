"""On-mesh pose-graph stitching == host stitcher equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.geometry import axis_angle_from_matrix, so3_rotation_matrix
from davo_tpu.parallel import (
    build_window_edges,
    distributed_stitch_windows,
    make_mesh,
)
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    _to_window_frame,
    _window_starts,
    generate_trajectory,
    stitch_windows_global,
)


def _window_poses_from_trajectory(key, num_frames=16, window=4, noise=0.01):
    """True window-relative poses with per-window noise + random gauge
    scale — the stitcher's actual input distribution."""
    config = TrajectoryConfig(num_frames=num_frames, window=window)
    poses, _, _, _ = generate_trajectory(key, config)
    starts = _window_starts(num_frames, window, window - 2)
    window_poses = []
    for wi, s in enumerate(starts):
        rel = _to_window_frame(poses[s : s + window], poses[s])
        k = jax.random.fold_in(key, 100 + wi)
        scale = jnp.exp(0.3 * jax.random.normal(k))
        rel = rel.at[:, 3:6].multiply(scale)
        rel = rel.at[1:].add(
            noise * jax.random.normal(jax.random.fold_in(k, 1), (window - 1, 6))
        )
        window_poses.append(rel)
    return starts, window_poses, poses


def test_build_window_edges_pads_and_indexes():
    wp = [jnp.zeros((3, 6)), jnp.zeros((3, 6))]
    edges = build_window_edges([0, 1], wp, pad_to=8)
    assert edges.start.shape == (8,)
    np.testing.assert_array_equal(np.asarray(edges.weight), [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(edges.frame[:4]), [1, 2, 2, 3])
    np.testing.assert_array_equal(np.asarray(edges.window[:4]), [0, 0, 1, 1])


@pytest.mark.parametrize(
    "num_frames,window",
    [
        pytest.param(8, 4, marks=pytest.mark.slow),
        pytest.param(16, 4, marks=pytest.mark.slow),
    ],
)
def test_distributed_matches_host_stitcher(rng, num_frames, window):
    key = jax.random.key(rng.integers(1 << 30))
    starts, window_poses, _ = _window_poses_from_trajectory(
        key, num_frames, window
    )
    host = stitch_windows_global(starts, window_poses, num_frames)
    mesh = make_mesh(8)
    dist = distributed_stitch_windows(
        starts, window_poses, num_frames, mesh, axis_name="data"
    )
    # host solves the rectangular system by SVD lstsq, the mesh version by
    # damped normal equations — identical up to conditioning-limited bits
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(host), rtol=1e-4, atol=5e-5
    )


@pytest.mark.slow
def test_distributed_stitcher_recovers_clean_windows(rng):
    # noise-free, unit-scale windows must stitch to the exact trajectory
    key = jax.random.key(rng.integers(1 << 30))
    num_frames, window = 12, 4
    starts, window_poses, poses = _window_poses_from_trajectory(
        key, num_frames, window, noise=0.0
    )
    mesh = make_mesh(4)
    dist = distributed_stitch_windows(
        starts, window_poses, num_frames, mesh, axis_name="data"
    )
    # gauge: frame 0 identity + first window's scale; re-express the truth
    truth_rel = _to_window_frame(poses, poses[0])
    # match the first relative translation's scale
    s = jnp.linalg.norm(dist[1, 3:6]) / jnp.maximum(
        jnp.linalg.norm(truth_rel[1, 3:6]), 1e-12
    )
    expected = truth_rel.at[:, 3:6].multiply(s)
    np.testing.assert_allclose(
        np.asarray(dist), np.asarray(expected), rtol=1e-4, atol=1e-5
    )
