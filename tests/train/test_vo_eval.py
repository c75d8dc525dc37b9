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


@pytest.mark.slow
def test_windowed_vo_beats_noisy_prior(key):
    poses, points, pixels, visibility = generate_trajectory(key, CFG)
    k = jax.random.fold_in(key, 1)
    estimates = solve_windowed_vo(poses, points, pixels, visibility, CFG, k)
    est_c = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    ate = absolute_trajectory_error(est_c, true_c)
    # the prior has init_noise-scale error; the solve must land far below
    assert float(ate["rmse"]) < 0.01, dict(ate)


@pytest.mark.slow
def test_evaluate_vo_end_to_end(key):
    ate = evaluate_vo(key, CFG)
    assert set(ate) == {"rmse", "mean", "median", "max"}
    assert float(ate["rmse"]) < 0.01


class TestLearnedVO:
    def _oracle_guess_fn(self, poses, points, cfg, noise=0.0, seed=0):
        """A guess_fn that returns the ground-truth window calibration
        vector, with a deliberately different gauge scale per call — the
        stitching must recover a consistent trajectory regardless.  With
        ``noise`` the window-relative poses are perturbed (per-window
        estimation error), deterministically from ``seed`` so two stitch
        modes can be compared on identical window solves."""
        from davo_tpu.train.vo_eval import _to_window_frame
        from davo_tpu.geometry import so3_rotation_matrix

        call_count = {"n": 0}
        rng = np.random.default_rng(seed)

        def guess_fn(pixels_window, vis_window):
            call_count["n"] += 1
            scale = 1.0 + 0.4 * call_count["n"]
            # identify the window by matching pixels against the sequence
            # (frames are unique): find the start index
            full_pixels = self._pixels
            for start in range(full_pixels.shape[0]):
                if start + cfg.window <= full_pixels.shape[0] and np.allclose(
                    np.asarray(full_pixels[start]),
                    np.asarray(pixels_window[0, 0]),
                ):
                    break
            idx = jnp.arange(start, start + cfg.window)
            rel_poses = _to_window_frame(poses[idx], poses[start])
            if noise > 0.0:
                rel_poses = rel_poses.at[1:].add(
                    noise * rng.standard_normal((cfg.window - 1, 6))
                )
            r0 = so3_rotation_matrix(poses[start, 0:3])
            pts_cam = (
                jnp.einsum("ij,nj->ni", r0, points) + poses[start, 3:6]
            )
            f = cfg.focal_length
            f_param = jnp.where(f >= 1.0, f - 1.0, jnp.log(f))
            vec = jnp.concatenate(
                [
                    jnp.asarray([f_param, 0.0, 0.0]),
                    (scale * pts_cam).reshape(-1),
                    (scale * rel_poses[1:, 3:6]).reshape(-1),
                    rel_poses[1:, 0:3].reshape(-1),
                ]
            )
            return vec[None]

        return guess_fn

    @pytest.mark.parametrize("stitch", ["chain", "global"])
    def test_oracle_guess_recovers_trajectory(self, key, stitch):
        cfg = TrajectoryConfig(num_frames=9, num_points=16, window=4)
        poses, points, pixels, visibility = generate_trajectory(key, cfg)
        self._pixels = pixels
        from davo_tpu.train.vo_eval import solve_windowed_vo_learned

        guess_fn = self._oracle_guess_fn(poses, points, cfg)
        estimates = solve_windowed_vo_learned(
            guess_fn, pixels, visibility, cfg, stitch=stitch
        )
        est_c = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
        ate = absolute_trajectory_error(est_c, true_c)
        # per-window gauge scales differ by 40% each call: the stitching
        # must still recover a consistent trajectory
        assert float(ate["rmse"]) < 1e-4, dict(ate)

    def _stitched_ate(self, key, stitch, stride=0, noise=0.02, frames=14):
        from davo_tpu.train.vo_eval import solve_windowed_vo_learned

        cfg = TrajectoryConfig(
            num_frames=frames, num_points=16, window=4, stride=stride
        )
        poses, points, pixels, visibility = generate_trajectory(key, cfg)
        self._pixels = pixels
        guess_fn = self._oracle_guess_fn(poses, points, cfg, noise=noise)
        estimates = solve_windowed_vo_learned(
            guess_fn, pixels, visibility, cfg, stitch=stitch
        )
        est_c = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
        return float(absolute_trajectory_error(est_c, true_c)["rmse"])

    @pytest.mark.slow
    def test_global_stitch_beats_chain_under_window_noise(self, key):
        # identical noisy window solves (same seed) for both modes.  At
        # stride 1 greedy chaining compounds scale errors catastrophically
        # (each window's scale comes from one noise-sensitive short-edge
        # pair estimated from *previous* windows); the joint
        # overlap-consistent solve must stay an order of magnitude below.
        ates = {
            stitch: np.mean(
                [
                    self._stitched_ate(
                        jax.random.fold_in(key, t),
                        stitch,
                        stride=1,
                        noise=0.002,
                    )
                    for t in range(3)
                ]
            )
            for stitch in ("chain", "global")
        }
        assert ates["global"] < 0.25 * ates["chain"], ates

    @pytest.mark.slow
    def test_denser_stride_tightens_global_stitch(self, key):
        # stride 1 doubles the overlap constraints; in the small-noise
        # regime of real window solves it should tighten the joint stitch
        ate_default = np.mean(
            [
                self._stitched_ate(
                    jax.random.fold_in(key, t), "global", noise=0.002
                )
                for t in range(4)
            ]
        )
        ate_dense = np.mean(
            [
                self._stitched_ate(
                    jax.random.fold_in(key, t), "global", stride=1, noise=0.002
                )
                for t in range(4)
            ]
        )
        assert ate_dense < ate_default, (ate_dense, ate_default)

    def test_invalid_stride_raises(self, key):
        from davo_tpu.train.vo_eval import solve_windowed_vo_learned

        cfg = TrajectoryConfig(num_frames=9, num_points=8, window=4, stride=3)
        _, _, pixels, visibility = generate_trajectory(key, cfg)
        with pytest.raises(ValueError):
            solve_windowed_vo_learned(
                lambda p, v: None, pixels, visibility, cfg
            )

    def test_window_too_small_raises(self, key):
        from davo_tpu.train.vo_eval import solve_windowed_vo_learned
        import pytest as _pytest

        cfg = TrajectoryConfig(num_frames=6, num_points=8, window=2)
        _, _, pixels, visibility = generate_trajectory(key, cfg)
        with _pytest.raises(ValueError):
            solve_windowed_vo_learned(lambda p, v: None, pixels, visibility, cfg)

    def test_sequence_shorter_than_window_raises(self, key):
        from davo_tpu.train.vo_eval import solve_windowed_vo_learned
        import pytest as _pytest

        cfg = TrajectoryConfig(num_frames=3, num_points=8, window=4)
        _, _, pixels, visibility = generate_trajectory(key, cfg)
        with _pytest.raises(ValueError):
            solve_windowed_vo_learned(lambda p, v: None, pixels, visibility, cfg)

    @pytest.mark.slow
    def test_untrained_network_runs_end_to_end(self, key):
        import jax
        from davo_tpu.models import CalibrationNetwork
        from davo_tpu.solve import BFGSConfig
        from davo_tpu.train.vo_eval import evaluate_learned_vo

        cfg = TrajectoryConfig(num_frames=7, num_points=8, window=3)
        net = CalibrationNetwork(
            num_views=3,
            num_points=8,
            hidden_size=16,
            solver=BFGSConfig(
                error_threshold=1e-7,
                iterations=3,
                drop_path_p=0.0,
                line_search_iterations=8,
            ),
        )
        _, _, pixels, visibility = generate_trajectory(key, cfg)
        variables = net.init(
            {"params": key}, pixels[:3][None], visibility[:3][None]
        )

        def guess_fn(pw, vw):
            return net.apply(variables, pw, vw)

        ate = evaluate_learned_vo(guess_fn, key, cfg)
        assert np.isfinite(float(ate["rmse"]))


class TestGlobalRefinement:
    def test_triangulation_recovers_points(self, key):
        from davo_tpu.train.vo_eval import triangulate_points

        cfg = TrajectoryConfig(num_frames=8, num_points=12)
        poses, points, pixels, visibility = generate_trajectory(key, cfg)
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        out = triangulate_points(poses, intr, pixels, visibility)
        vis_enough = np.asarray(visibility.sum(0)) >= 3
        np.testing.assert_allclose(
            np.asarray(out)[vis_enough],
            np.asarray(points)[vis_enough],
            atol=1e-4,
        )

    def test_refinement_cleans_noisy_trajectory(self, key):
        from davo_tpu.train.vo_eval import refine_trajectory_global

        cfg = TrajectoryConfig(num_frames=8, num_points=24)
        poses, points, pixels, visibility = generate_trajectory(key, cfg)
        noisy = poses.at[1:].add(
            0.03 * jax.random.normal(jax.random.fold_in(key, 3), (7, 6))
        )
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        refined = refine_trajectory_global(noisy, intr, pixels, visibility)
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
        before = absolute_trajectory_error(
            camera_centers_from_poses(noisy[:, 0:3], noisy[:, 3:6]), true_c
        )
        after = absolute_trajectory_error(
            camera_centers_from_poses(refined[:, 0:3], refined[:, 3:6]), true_c
        )
        assert float(after["rmse"]) < 0.1 * float(before["rmse"]), (
            dict(before),
            dict(after),
        )

    @pytest.mark.slow
    def test_multi_round_refinement_recovers_scale_drift(self, key):
        """Alternating re-triangulation + BA rounds must beat a single
        pass on a trajectory corrupted by accumulating scale drift (the
        learned-VO stitching failure mode)."""
        from davo_tpu.train.vo_eval import refine_trajectory_global

        cfg = TrajectoryConfig(num_frames=10, num_points=24)
        poses, _, pixels, visibility = generate_trajectory(key, cfg)
        # per-frame multiplicative drift on the translation magnitude,
        # compounding along the sequence like chained window scales
        drift = jnp.cumprod(
            1.0
            + 0.04 * jax.random.normal(jax.random.fold_in(key, 5), (10,))
        )
        drifted = poses.at[:, 3:6].multiply(drift[:, None])
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])

        def ate(est):
            return float(
                absolute_trajectory_error(
                    camera_centers_from_poses(est[:, 0:3], est[:, 3:6]),
                    true_c,
                )["rmse"]
            )

        one = refine_trajectory_global(drifted, intr, pixels, visibility)
        three = refine_trajectory_global(
            drifted, intr, pixels, visibility, rounds=3
        )
        assert ate(three) <= ate(one) + 1e-9, (ate(one), ate(three))
        assert ate(three) < 0.5 * ate(drifted)

    @pytest.mark.slow
    def test_host_polish_solves_in_f64_from_f32_inputs(self, key):
        """The host polish takes f32 (TPU-resident) arrays, runs the whole
        triangulate+BA refinement in float64 on the host, and hands back
        the input dtype.  From an unrefined noisy start it must reach the
        (noise-free) global optimum to f32-representable accuracy."""
        from davo_tpu.train.vo_eval import refine_trajectory_host_f64

        cfg = TrajectoryConfig(num_frames=10, num_points=16)
        poses, _, pixels, visibility = generate_trajectory(key, cfg)
        noisy = poses.at[1:].add(
            0.05 * jax.random.normal(jax.random.fold_in(key, 9), (9, 6))
        )
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])

        def ate(est):
            est = est.astype(true_c.dtype)
            return float(
                absolute_trajectory_error(
                    camera_centers_from_poses(est[:, 0:3], est[:, 3:6]),
                    true_c,
                )["rmse"]
            )

        polished = refine_trajectory_host_f64(
            noisy.astype(jnp.float32),
            intr.astype(jnp.float32),
            pixels.astype(jnp.float32),
            visibility,
        )
        assert polished.dtype == jnp.float32  # returned in input dtype
        assert ate(polished) < 1e-4, ate(polished)

    def test_scale_drift_correction_recovers_segment_scales(self, key):
        """``correct_scale_drift`` must undo compounding per-segment scale
        errors of the camera-centre increments (the stitching failure
        mode) without touching rotations."""
        from davo_tpu.geometry import so3_rotation_matrix
        from davo_tpu.train.vo_eval import correct_scale_drift

        cfg = TrajectoryConfig(num_frames=12, num_points=16)
        poses, _, pixels, visibility = generate_trajectory(key, cfg)
        rot = so3_rotation_matrix(poses[:, 0:3])
        centres = -jnp.einsum("kji,kj->ki", rot, poses[:, 3:6])
        deltas = centres[1:] - centres[:-1]
        seg_scale = 1.0 + 0.15 * jax.random.normal(
            jax.random.fold_in(key, 6), (11,)
        )
        bad_centres = centres[0] + jnp.concatenate(
            [jnp.zeros((1, 3)), jnp.cumsum(seg_scale[:, None] * deltas, 0)]
        )
        bad_t = -jnp.einsum("kij,kj->ki", rot, bad_centres)
        bad = jnp.concatenate([poses[:, 0:3], bad_t], axis=-1)
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])

        def ate(est):
            return float(
                absolute_trajectory_error(
                    camera_centers_from_poses(est[:, 0:3], est[:, 3:6]),
                    true_c,
                )["rmse"]
            )

        corrected = correct_scale_drift(bad, intr, pixels, visibility)
        assert ate(corrected) < 1e-3, (ate(bad), ate(corrected))
        # rotations untouched
        np.testing.assert_array_equal(corrected[:, 0:3], bad[:, 0:3])

    def test_rescale_segments_identity_at_zero(self, key):
        from davo_tpu.train.vo_eval import _rescale_segments

        cfg = TrajectoryConfig(num_frames=8, num_points=8)
        poses, _, _, _ = generate_trajectory(key, cfg)
        out = _rescale_segments(poses, jnp.zeros(7))
        np.testing.assert_allclose(out, poses, atol=1e-5)

    @pytest.mark.slow
    def test_multistart_escapes_scale_drift_minimum(self, key):
        """A strongly drifted trajectory whose single-start refinement
        stays trapped must be recovered by the multi-hypothesis scale-mode
        search (cost selects the true basin on noiseless sequences)."""
        from davo_tpu.train.vo_eval import (
            _rescale_segments,
            refine_trajectory_global,
            refine_trajectory_multistart,
        )

        cfg = TrajectoryConfig(num_frames=12, num_points=8)
        poses, _, pixels, visibility = generate_trajectory(key, cfg)
        # a large low-frequency scale deformation (the stitching error mode)
        seg = jnp.arange(11, dtype=poses.dtype)
        log_s = 0.5 * jnp.cos(jnp.pi * (seg + 0.5) / 11.0)
        drifted = _rescale_segments(poses, log_s)
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        true_c = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])

        def ate(est):
            return float(
                absolute_trajectory_error(
                    camera_centers_from_poses(est[:, 0:3], est[:, 3:6]),
                    true_c,
                )["rmse"]
            )

        single = refine_trajectory_global(
            drifted, intr, pixels, visibility, rounds=2
        )
        multi = refine_trajectory_multistart(
            drifted,
            intr,
            pixels,
            visibility,
            jax.random.fold_in(key, 11),
            num_hypotheses=16,
            sigma=0.4,
        )
        assert ate(multi) <= ate(single) + 1e-6, (ate(single), ate(multi))
        assert ate(multi) < 0.25 * ate(drifted), (ate(drifted), ate(multi))

    def test_refinement_on_mesh_matches(self, key):
        from davo_tpu.train.vo_eval import refine_trajectory_global
        from davo_tpu.parallel import make_mesh

        cfg = TrajectoryConfig(num_frames=6, num_points=16)
        poses, _, pixels, visibility = generate_trajectory(key, cfg)
        noisy = poses.at[1:].add(0.02)
        intr = jnp.asarray([cfg.focal_length, 0.0, 0.0])
        single = refine_trajectory_global(noisy, intr, pixels, visibility)
        sharded = refine_trajectory_global(
            noisy, intr, pixels, visibility, mesh=make_mesh(4)
        )
        np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-6)


def test_noisy_pixels_degrade_gracefully(key):
    noisy_cfg = TrajectoryConfig(
        num_frames=9, num_points=24, window=3, pixel_noise=0.002
    )
    ate = evaluate_vo(key, noisy_cfg)
    assert np.isfinite(float(ate["rmse"]))
    assert float(ate["rmse"]) < 0.5
