"""TUM/KITTI trajectory formats + file-based sequence evaluation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.data.sequences import (
    associate_timestamps,
    load_kitti_calib,
    load_kitti_trajectory,
    load_sequence,
    load_tum_intrinsics,
    load_tum_trajectory,
)
from davo_tpu.geometry import so3_rotation_matrix
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
    relative_pose_error,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")


def _fix(name):
    return os.path.join(FIXTURES, name)


def test_tum_roundtrip_against_kitti():
    # both fixtures encode the SAME trajectory; loaded poses must agree
    tum = load_tum_trajectory(_fix("tum_mini_groundtruth.txt"))
    kitti = load_kitti_trajectory(_fix("kitti_mini_00.txt"))
    assert tum.poses.shape == (12, 6)
    assert tum.timestamps is not None and len(tum.timestamps) == 12
    np.testing.assert_allclose(
        np.asarray(tum.poses), np.asarray(kitti.poses), atol=1e-4
    )


def test_tum_loader_world_to_camera_convention():
    seq = load_tum_trajectory(_fix("tum_mini_groundtruth.txt"))
    # camera centres from the world->camera poses must equal the raw
    # tx ty tz columns of the file (which are camera-to-world positions)
    raw = []
    with open(_fix("tum_mini_groundtruth.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            raw.append([float(x) for x in line.split()[1:4]])
    centres = camera_centers_from_poses(seq.poses[:, 0:3], seq.poses[:, 3:6])
    np.testing.assert_allclose(np.asarray(centres), np.asarray(raw), atol=1e-6)


def test_intrinsics_normalisation():
    intr = load_tum_intrinsics(
        _fix("tum_mini_intrinsics.txt"), image_size=(640, 480)
    )
    np.testing.assert_allclose(float(intr[0]), 525.0 / 320.0)
    np.testing.assert_allclose(float(intr[1]), 319.5 / 320.0 - 1.0)
    calib = load_kitti_calib(
        _fix("kitti_mini_calib.txt"), image_size=(1241, 376)
    )
    np.testing.assert_allclose(float(calib[0]), 718.856 / 620.5)


def test_associate_timestamps():
    a = np.asarray([0.0, 0.1, 0.2, 0.35])
    b = np.asarray([0.005, 0.104, 0.31, 0.349])
    ia, ib = associate_timestamps(a, b, max_dt=0.02)
    np.testing.assert_array_equal(ia, [0, 1, 3])
    np.testing.assert_array_equal(ib, [0, 1, 3])


def test_rpe_zero_for_identical_and_positive_for_perturbed(rng):
    seq = load_tum_trajectory(_fix("tum_mini_groundtruth.txt"))
    zero = relative_pose_error(seq.poses, seq.poses)
    assert float(zero["trans_rmse"]) < 1e-9
    assert float(zero["rot_rmse"]) < 1e-6
    perturbed = seq.poses + 0.01 * jnp.asarray(
        rng.normal(size=seq.poses.shape)
    )
    nonzero = relative_pose_error(perturbed, seq.poses)
    assert float(nonzero["trans_rmse"]) > 1e-4
    with pytest.raises(ValueError):
        relative_pose_error(seq.poses, seq.poses, delta=0)


def test_estimated_vs_groundtruth_ate():
    gt = load_tum_trajectory(_fix("tum_mini_groundtruth.txt"))
    est = load_tum_trajectory(_fix("tum_mini_estimated.txt"))
    ia, ib = associate_timestamps(est.timestamps, gt.timestamps)
    assert len(ia) == 12
    est_c = camera_centers_from_poses(
        est.poses[ia, 0:3], est.poses[ia, 3:6]
    )
    gt_c = camera_centers_from_poses(gt.poses[ib, 0:3], gt.poses[ib, 3:6])
    ate = absolute_trajectory_error(est_c, gt_c)
    # the fixture estimate is gt + 0.05-sigma position noise
    assert 0.0 < float(ate["rmse"]) < 0.2


@pytest.mark.slow
def test_evaluate_vo_sequence_file_end_to_end(fixed_random_seed):
    from davo_tpu.train.vo_eval import TrajectoryConfig, evaluate_vo_sequence_file
    from davo_tpu.parallel import SchurConfig

    config = TrajectoryConfig(
        window=4, solver=SchurConfig(iterations=8, damping=1e-4)
    )
    for fmt, name in (
        ("tum", "tum_mini_groundtruth.txt"),
        ("kitti", "kitti_mini_00.txt"),
    ):
        metrics = evaluate_vo_sequence_file(
            _fix(name),
            format=fmt,
            config=config,
            key=jax.random.key(fixed_random_seed),
            num_points=24,
        )
        assert int(metrics["num_frames"]) == 12
        # oracle-quality observations + noisy-prior windowed BA recovers
        # the file trajectory closely
        assert float(metrics["rmse"]) < 0.05, (fmt, metrics)
        assert float(metrics["rpe_trans_rmse"]) < 0.1


def test_malformed_files_raise(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("1.0 2.0 3.0\n")
    with pytest.raises(ValueError):
        load_tum_trajectory(str(bad))
    with pytest.raises(ValueError):
        load_kitti_trajectory(str(bad))
    with pytest.raises(ValueError):
        load_sequence(str(bad), format="nope")
