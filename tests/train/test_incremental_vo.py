"""Incremental SfM (PnP + re-triangulation + BA) — the round-3 answer to
under-constrained independent window solves (see solve_incremental_vo
docstring for the DOF arithmetic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import CalibrationParameters, pack_calibration_parameters
from davo_tpu.geometry import so3_rotation_matrix
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
)
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    _to_window_frame,
    generate_trajectory,
    pnp_pose,
    solve_incremental_vo,
    solve_learned_vo_incremental,
)


def _ate(est, poses):
    est_c = camera_centers_from_poses(est[:, 0:3], est[:, 3:6])
    true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    return float(absolute_trajectory_error(est_c, true_c)["rmse"])


def test_pnp_recovers_pose(key):
    cfg = TrajectoryConfig(num_frames=6, num_points=16)
    poses, points, pixels, visibility = generate_trajectory(key, cfg)
    intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
    k = 3
    init = poses[k] + 0.05 * jax.random.normal(key, (6,))
    solved = pnp_pose(
        points, pixels[k], visibility[k].astype(pixels.dtype), intr, init
    )
    assert float(jnp.max(jnp.abs(solved - poses[k]))) < 1e-4


def test_pnp_huber_rejects_outliers(key):
    cfg = TrajectoryConfig(num_frames=6, num_points=16)
    poses, points, pixels, visibility = generate_trajectory(key, cfg)
    intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
    k = 3
    bad = pixels[k].at[0].add(jnp.asarray([0.6, -0.4])).at[5].add(
        jnp.asarray([-0.5, 0.3])
    )
    init = poses[k] + 0.05 * jax.random.normal(key, (6,))
    solved = pnp_pose(
        points, bad, visibility[k].astype(pixels.dtype), intr, init,
        huber_rounds=3,
    )
    assert float(jnp.max(jnp.abs(solved - poses[k]))) < 5e-3


def test_incremental_exact_on_oracle_tracks(key):
    cfg = TrajectoryConfig(num_frames=12, num_points=8)
    poses, _, pixels, visibility = generate_trajectory(key, cfg)
    intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
    boot = _to_window_frame(poses[:4], poses[0])
    est = solve_incremental_vo(pixels, visibility, intr, boot)
    assert _ate(est, poses) < 1e-4


def test_incremental_robust_to_sparse_visibility(key):
    """The decisive property the window pipeline lacks: a gated-sparse
    visibility pattern costs (almost) nothing because constraints
    accumulate across frames."""
    cfg = TrajectoryConfig(num_frames=12, num_points=8)
    poses, _, pixels, visibility = generate_trajectory(key, cfg)
    intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
    boot = _to_window_frame(poses[:4], poses[0])
    # 30% dropout keeps every frame at >= min_pnp_tracks visible tracks;
    # below that (e.g. a frame with 2 tracks = 4 observations for 6 pose
    # DOF) PnP is skipped and the constant-velocity fallback drifts —
    # the documented limit of the accumulator, not a regression.
    drop = jax.random.bernoulli(key, 0.3, visibility.shape).at[0].set(False)
    est = solve_incremental_vo(pixels, visibility & ~drop, intr, boot)
    assert _ate(est, poses) < 1e-3


def test_detection_pipeline_robust_options(key):
    """solve_incremental_vo_detections with the round-4 robustness
    options (ba_irls / pnp_ransac / chain_passes / reject_outliers)
    stays exact on clean detections and survives spurious ones."""
    import numpy as np

    from davo_tpu.train.vo_eval import solve_incremental_vo_detections

    cfg = TrajectoryConfig(num_frames=10, num_points=8)
    poses, _, pixels, visibility = generate_trajectory(key, cfg)
    intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
    boot = _to_window_frame(poses[:2], poses[0])
    kf = cfg.num_frames
    # detections = oracle projections + spurious junk blobs, shuffled
    rng = np.random.default_rng(7)
    d = 12
    dets = np.asarray(
        0.95 * (2.0 * rng.random((kf, d, 2)) - 1.0), np.float32
    )
    scores = np.full((kf, d), 0.4, np.float32)
    pix_np = np.asarray(pixels)
    vis_np = np.asarray(visibility)
    for k in range(kf):
        order = rng.permutation(d)[: pix_np.shape[1]]
        dets[k, order] = pix_np[k]
        scores[k, order] = np.where(vis_np[k], 0.9, 0.0)
    est, cost = solve_incremental_vo_detections(
        jnp.asarray(dets),
        jnp.asarray(scores),
        intr,
        boot,
        pixels[:2],
        visibility[:2].astype(pixels.dtype),
        ba_irls=1,
        pnp_ransac=4,
        chain_passes=2,
        reject_outliers=True,
        return_cost=True,
    )
    assert _ate(est, poses) < 5e-3
    # the coverage-penalised self-consistency cost of a healthy chain is
    # at the detection-noise floor
    assert float(cost) < 5e-3


def test_learned_pipeline_plumbing(key):
    """solve_learned_vo_incremental with a truth-vector guess_fn: the
    bootstrap/intrinsics unpacking and the full chain reach oracle ATE."""
    cfg = TrajectoryConfig(num_frames=12, num_points=8)
    poses, points, pixels, visibility = generate_trajectory(key, cfg)
    w = cfg.window
    rel = _to_window_frame(poses[:w], poses[0])
    f = cfg.focal_length
    f_param = jnp.where(f >= 1.0, f - 1.0, jnp.log(f))
    r0 = so3_rotation_matrix(poses[0, 0:3])
    pts0 = jnp.einsum("ij,nj->ni", r0, points) + poses[0, 3:6]
    vec = pack_calibration_parameters(
        CalibrationParameters(
            intrinsics=jnp.asarray([f_param, 0.0, 0.0]).reshape(1, 1, 3),
            world_points=pts0.reshape(1, 8, 3),
            camera_translations=rel[1:, 3:6].reshape(w - 1, 1, 3),
            camera_rotations=rel[1:, 0:3].reshape(w - 1, 1, 3),
        )
    )
    est = solve_learned_vo_incremental(
        lambda pw, vw: vec[None],
        pixels,
        visibility.astype(pixels.dtype),
        cfg,
    )
    assert _ate(est, poses) < 1e-4
