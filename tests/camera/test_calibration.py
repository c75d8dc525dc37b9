import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    num_calibration_parameters,
    unpack_calibration_parameters,
    pack_calibration_parameters,
    get_camera_relative_points,
    calibration_error,
)
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.geometry import rotate_vector_axis_angle


class TestPacking:
    def test_param_count(self):
        assert num_calibration_parameters(4, 8) == 3 + 24 + 18

    def test_roundtrip(self, rng):
        m, n = 4, 8
        p = num_calibration_parameters(m, n)
        vec = jnp.asarray(rng.normal(size=(5, p)))
        params = unpack_calibration_parameters(vec, m, n)
        assert params.intrinsics.shape == (5, 1, 1, 3)
        assert params.world_points.shape == (5, 1, n, 3)
        assert params.camera_translations.shape == (5, m - 1, 1, 3)
        assert params.camera_rotations.shape == (5, m - 1, 1, 3)
        np.testing.assert_array_equal(pack_calibration_parameters(params), vec)

    def test_wrong_size_raises(self):
        with pytest.raises(ValueError):
            unpack_calibration_parameters(jnp.zeros((2, 10)), 4, 8)

    def test_slices_are_in_layout_order(self, rng):
        m, n = 2, 2
        vec = jnp.arange(num_calibration_parameters(m, n), dtype=jnp.float64)
        params = unpack_calibration_parameters(vec, m, n)
        np.testing.assert_array_equal(params.intrinsics.ravel(), [0, 1, 2])
        np.testing.assert_array_equal(
            params.world_points.ravel(), [3, 4, 5, 6, 7, 8]
        )
        np.testing.assert_array_equal(
            params.camera_translations.ravel(), [9, 10, 11]
        )
        np.testing.assert_array_equal(
            params.camera_rotations.ravel(), [12, 13, 14]
        )


class TestCameraRelativePoints:
    def test_first_view_is_scaled_world_points(self, rng):
        wp = jnp.asarray(rng.normal(size=(1, 5, 3)))
        t = jnp.asarray(rng.normal(size=(2, 1, 3)))
        r = jnp.asarray(rng.normal(size=(2, 1, 3)) * 0.2)
        out = get_camera_relative_points(wp, t, r)
        assert out.shape == (3, 5, 3)
        # view 1 = world points over the common gauge scale
        ratio = np.asarray(out[0]) / np.asarray(wp[0])
        np.testing.assert_allclose(ratio, ratio.flat[0], rtol=1e-6)

    def test_gauge_scale_normalises_mean_abs(self, rng):
        wp = jnp.asarray(rng.normal(size=(1, 6, 3)) * 10.0)
        t = jnp.asarray(rng.normal(size=(3, 1, 3)) * 10.0)
        r = jnp.zeros((3, 1, 3))
        num_points, num_views = 6, 4
        out = get_camera_relative_points(wp, t, r)
        # Recompute the scale the function should have applied.
        ps = np.mean(np.abs(np.asarray(wp)))
        cs = np.mean(np.abs(np.asarray(t)))
        scale = (ps * num_points + cs * num_views) / (num_points + num_views)
        np.testing.assert_allclose(out[0], np.asarray(wp[0]) / scale, rtol=1e-6)

    def test_identity_transform_views_match(self, rng):
        wp = jnp.asarray(rng.normal(size=(1, 4, 3)))
        t = jnp.zeros((1, 1, 3))
        r = jnp.zeros((1, 1, 3))
        out = get_camera_relative_points(wp, t, r)
        np.testing.assert_allclose(out[0], out[1], rtol=1e-6)

    def test_rotation_applied(self, rng):
        wp = jnp.asarray(rng.normal(size=(1, 4, 3)))
        r = jnp.asarray([[[0.0, 0.0, np.pi / 2]]])
        t = jnp.zeros((1, 1, 3))
        out = get_camera_relative_points(wp, t, r)
        expected = rotate_vector_axis_angle(out[0], jnp.asarray([0.0, 0.0, np.pi / 2]))
        np.testing.assert_allclose(out[1], expected, rtol=1e-6, atol=1e-8)


class TestCalibrationError:
    def _true_parameters(self, scene, scale):
        # Assemble the flat parameter vector from the ground-truth scene.
        # The error is gauge-scale invariant, so any positive scale works.
        intr = np.asarray(scene.camera_intrinsics)
        # invert the f' = elu(f)+1 parametrisation:
        # f' >= 1 -> f = f' - 1; f' < 1 -> f = log(f')
        f = intr[:, 0]
        f_param = np.where(f >= 1.0, f - 1.0, np.log(np.maximum(f, 1e-6)))
        vec = np.concatenate(
            [
                np.stack([f_param, intr[:, 1], intr[:, 2]], axis=-1),
                np.asarray(scene.world_points).reshape(len(f), -1) * scale,
                np.asarray(scene.camera_translations).reshape(len(f), -1) * scale,
                np.asarray(scene.camera_orientations).reshape(len(f), -1),
            ],
            axis=-1,
        )
        return jnp.asarray(vec)

    def test_zero_at_ground_truth(self, key):
        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 4, cfg)
        params = self._true_parameters(scenes, scale=1.0)
        err = calibration_error(
            params, scenes.projected_points, scenes.visibility_mask
        )
        np.testing.assert_allclose(err, np.zeros(4), atol=1e-5)

    def test_gauge_scale_invariant(self, key):
        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        e1 = calibration_error(
            self._true_parameters(scenes, 1.0),
            scenes.projected_points,
            scenes.visibility_mask,
        )
        e2 = calibration_error(
            self._true_parameters(scenes, 3.7),
            scenes.projected_points,
            scenes.visibility_mask,
        )
        np.testing.assert_allclose(e1, e2, atol=1e-6)

    def test_positive_away_from_truth(self, key, rng):
        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        params = self._true_parameters(scenes, 1.0)
        noisy = params + 0.3 * jnp.asarray(rng.normal(size=params.shape))
        err = calibration_error(
            noisy, scenes.projected_points, scenes.visibility_mask
        )
        assert np.all(np.asarray(err) > 1e-4)

    def test_gradients_finite(self, key, rng):
        cfg = SceneConfig(num_views=3, num_points=5, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        params = self._true_parameters(scenes, 1.0)
        noisy = params + 0.1 * jnp.asarray(rng.normal(size=params.shape))
        g = jax.grad(
            lambda p: calibration_error(
                p, scenes.projected_points, scenes.visibility_mask
            ).sum()
        )(noisy)
        assert np.all(np.isfinite(g))


class TestBasinScore:
    def _true_parameters(self, scene, scale=1.0):
        return TestCalibrationError._true_parameters(self, scene, scale)

    def test_equals_error_at_ground_truth(self, key):
        # ground-truth scenes lie inside the plausible domain, so the
        # penalties are exactly zero and the score == the reprojection error
        from davo_tpu.camera import basin_score

        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 4, cfg)
        params = self._true_parameters(scenes)
        err = calibration_error(
            params, scenes.projected_points, scenes.visibility_mask
        )
        score = basin_score(
            params, scenes.projected_points, scenes.visibility_mask
        )
        np.testing.assert_allclose(score, err, atol=1e-12)

    def test_penalises_implausible_focal(self, key):
        from davo_tpu.camera import basin_score

        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        params = self._true_parameters(scenes)
        # push the raw focal parameter way above the domain (f_eff ~ 31)
        bad = params.at[:, 0].set(30.0)
        base = basin_score(params, scenes.projected_points, scenes.visibility_mask)
        worse = basin_score(bad, scenes.projected_points, scenes.visibility_mask)
        assert np.all(np.asarray(worse) > np.asarray(base))
        # and the focal penalty specifically exceeds the error change
        err_bad = calibration_error(
            bad, scenes.projected_points, scenes.visibility_mask
        )
        assert np.all(np.asarray(worse - err_bad) > 0.5)

    def test_penalises_points_behind_camera(self, key):
        from davo_tpu.camera import basin_score, unpack_calibration_parameters
        from davo_tpu.camera import pack_calibration_parameters

        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        params = self._true_parameters(scenes)
        unpacked = unpack_calibration_parameters(params, 3, 6)
        flipped = unpacked._replace(
            world_points=unpacked.world_points.at[..., 2].multiply(-1.0)
        )
        bad = pack_calibration_parameters(flipped)
        err_bad = calibration_error(
            bad, scenes.projected_points, scenes.visibility_mask
        )
        score_bad = basin_score(
            bad, scenes.projected_points, scenes.visibility_mask
        )
        assert np.all(np.asarray(score_bad) > np.asarray(err_bad))

    @pytest.mark.slow
    def test_network_selection_option(self, key):
        # the network accepts selection="basin" and returns the same shape
        from davo_tpu.models import CalibrationNetwork
        from davo_tpu.solve import BFGSConfig

        cfg = SceneConfig(num_views=3, num_points=4, dtype=jnp.float32)
        scenes = generate_batch(key, 2, cfg)
        net = CalibrationNetwork(
            num_views=3,
            num_points=4,
            hidden_size=16,
            solver=BFGSConfig(iterations=3, line_search_iterations=4),
            num_restarts=3,
            selection="basin",
        )
        variables = net.init(
            jax.random.key(0), scenes.projected_points, scenes.visibility_mask
        )
        out = net.apply(
            variables, scenes.projected_points, scenes.visibility_mask
        )
        assert out.shape == (2, 3 + 3 * 4 + 6 * 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_anchor_pulls_selection_towards_guess_focal(self, key):
        from davo_tpu.camera import BasinScoreConfig, basin_score

        cfg = SceneConfig(num_views=3, num_points=6, dtype=jnp.float64)
        scenes = generate_batch(key, 2, cfg)
        params = self._true_parameters(scenes)
        anchored = BasinScoreConfig(anchor_weight=2.0)
        # anchor at the true focal: zero extra penalty
        f_eff = np.asarray(scenes.camera_intrinsics)[:, 0]
        anchor = jnp.asarray(np.log(f_eff))
        base = basin_score(
            params, scenes.projected_points, scenes.visibility_mask,
            anchored, anchor_log_focal=anchor,
        )
        err = calibration_error(
            params, scenes.projected_points, scenes.visibility_mask
        )
        np.testing.assert_allclose(base, err, atol=1e-10)
        # anchor far away: score increases by anchor_weight * delta^2
        far = basin_score(
            params, scenes.projected_points, scenes.visibility_mask,
            anchored, anchor_log_focal=anchor + 1.0,
        )
        np.testing.assert_allclose(far - base, 2.0 * np.ones(2), atol=1e-8)
