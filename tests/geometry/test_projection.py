import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from davo_tpu.geometry import (
    project_points_basic_pinhole,
    project_points_clamped_pinhole,
    pixel_coordinates_to_homogeneous,
    project_points_pinhole_homogeneous,
    projective_plane_angle_distance,
    projective_plane_cosine_distance,
)


class TestBasicPinhole:
    def test_known_projection(self):
        points = jnp.asarray([2.0, -4.0, 2.0])
        intrinsics = jnp.asarray([1.5, 0.1, -0.2])
        out = project_points_basic_pinhole(points, intrinsics)
        np.testing.assert_allclose(out, [1.5 * 1.0 + 0.1, 1.5 * -2.0 - 0.2])

    def test_point_on_axis_projects_to_centre(self):
        out = project_points_basic_pinhole(
            jnp.asarray([0.0, 0.0, 5.0]), jnp.asarray([2.0, 0.3, 0.4])
        )
        np.testing.assert_allclose(out, [0.3, 0.4])

    def test_batched(self, rng):
        points = jnp.asarray(rng.normal(size=(4, 7, 3))) + jnp.asarray([0, 0, 5.0])
        intrinsics = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 1, 3)))
        out = project_points_basic_pinhole(points, intrinsics)
        assert out.shape == (4, 7, 2)

    def test_gradients(self, rng):
        points = jnp.asarray(rng.normal(size=(5, 3))) + jnp.asarray([0, 0, 5.0])
        intrinsics = jnp.asarray([1.2, 0.0, 0.0])
        check_grads(
            project_points_basic_pinhole,
            (points, intrinsics),
            order=1,
            atol=1e-5,
            rtol=1e-5,
        )


class TestClampedPinhole:
    def test_in_bounds_matches_exp_focal_pinhole(self):
        points = jnp.asarray([0.1, -0.2, 2.0])
        intrinsics = jnp.asarray([0.5, 0.05, -0.05])
        out = project_points_clamped_pinhole(points, intrinsics)
        expected = np.exp(0.5) * np.asarray([0.1, -0.2]) / 2.0 + [0.05, -0.05]
        np.testing.assert_allclose(out, expected, rtol=1e-10)

    def test_far_behind_camera_uses_log_branch(self):
        points = jnp.asarray([0.5, -0.5, -3.0])
        out = project_points_clamped_pinhole(points, jnp.zeros(3))
        expected_mag = 101.0 + np.log(3.0)
        np.testing.assert_allclose(out, [expected_mag, -expected_mag], rtol=1e-10)

    def test_just_behind_camera_linear_branch(self):
        points = jnp.asarray([0.5, -0.5, -0.5])
        out = project_points_clamped_pinhole(points, jnp.zeros(3))
        np.testing.assert_allclose(out, [100.5, -100.5], rtol=1e-10)

    def test_huge_projection_uses_log_falloff(self):
        # f + log|x| - log|z| = 0 + log(100) - log(0.1) > 0
        points = jnp.asarray([100.0, 0.0, 0.1])
        out = project_points_clamped_pinhole(points, jnp.zeros(3))
        expected_u = 1.0 + np.log(100.0) - np.log(0.1)
        np.testing.assert_allclose(out[0], expected_u, rtol=1e-10)

    def test_behind_camera_points_project_outside_bounds(self, rng):
        points = jnp.asarray(rng.normal(size=(32, 3)))
        points = points.at[:, 2].set(-jnp.abs(points[:, 2]) - 0.01)
        out = project_points_clamped_pinhole(points, jnp.zeros(3))
        assert np.all(np.abs(np.asarray(out)).max(axis=-1) > 1.0)

    def test_gradients_alive_everywhere(self, rng):
        # gradients exist in every branch
        zs = [-3.0, -0.5, 0.1, 2.0]
        for z in zs:
            points = jnp.asarray([0.4, -0.3, z])
            g = jax.jacfwd(project_points_clamped_pinhole)(points, jnp.zeros(3))
            assert np.all(np.isfinite(g)), f"non-finite gradient at z={z}"
            assert np.any(np.asarray(g) != 0.0)


class TestHomogeneous:
    def test_pixel_to_ray_centre_pixel(self):
        ray = pixel_coordinates_to_homogeneous(
            jnp.asarray([0.3, 0.4]), jnp.asarray([1.0, 0.3, 0.4])
        )
        # Centred pixel maps to the optical axis (0, 0, f').
        np.testing.assert_allclose(ray, [0.0, 0.0, 2.0])

    def test_focal_parametrisation_strictly_positive(self):
        for f in [-5.0, -1.0, 0.0, 2.0]:
            ray = pixel_coordinates_to_homogeneous(
                jnp.zeros(2), jnp.asarray([f, 0.0, 0.0])
            )
            assert float(ray[2]) > 0.0

    def test_pixel_ray_parallel_to_camera_point(self, rng):
        # project a 3D point, lift the pixel back to a ray: the ray must be
        # parallel to the camera-relative point (this pairing is the
        # calibration objective, networks/calibration_network.py:58-67).
        intrinsics = jnp.asarray([1.3, 0.2, -0.1])
        f = jax.nn.elu(intrinsics[0]) + 1.0
        points = jnp.asarray(rng.normal(size=(16, 3)))
        points = points.at[:, 2].set(jnp.abs(points[:, 2]) + 0.5)
        pixels = (f * points[:, 0:2] / points[:, 2:3]) + intrinsics[1:3]
        rays = pixel_coordinates_to_homogeneous(pixels, intrinsics)
        d = projective_plane_angle_distance(rays, points)
        np.testing.assert_allclose(d, np.zeros(16), atol=1e-6)

    def test_invalid_origin_becomes_unit_z(self):
        out = project_points_pinhole_homogeneous(
            jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0])
        )
        np.testing.assert_allclose(out, [0.0, 0.0, 1.0])

    def test_division_free_projection_matches_pinhole(self, rng):
        intrinsics = jnp.asarray([0.7, 0.1, 0.3])
        f = jax.nn.elu(intrinsics[0]) + 1.0
        points = jnp.asarray(rng.normal(size=(8, 3)))
        points = points.at[:, 2].set(jnp.abs(points[:, 2]) + 0.5)
        homog = project_points_pinhole_homogeneous(points, intrinsics)
        pixels = homog[:, 0:2] / homog[:, 2:3]
        expected = f * points[:, 0:2] / points[:, 2:3] + intrinsics[1:3]
        np.testing.assert_allclose(pixels, expected, rtol=1e-9)


class TestAngleDistance:
    def test_parallel_vectors_zero(self, rng):
        v = jnp.asarray(rng.normal(size=(8, 3)))
        d = projective_plane_angle_distance(v, 2.5 * v)
        np.testing.assert_allclose(d, np.zeros(8), atol=1e-7)

    def test_orthogonal_vectors(self):
        d = projective_plane_angle_distance(
            jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 1.0, 0.0])
        )
        np.testing.assert_allclose(d, np.pi / 2, rtol=1e-10)

    def test_opposite_vectors(self):
        d = projective_plane_angle_distance(
            jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([-1.0, 0.0, 0.0])
        )
        np.testing.assert_allclose(d, np.pi, rtol=1e-10)

    def test_matches_arccos_for_moderate_angles(self, rng):
        a = jnp.asarray(rng.normal(size=(16, 3)))
        b = jnp.asarray(rng.normal(size=(16, 3)))
        d = projective_plane_angle_distance(a, b)
        cos = np.sum(np.asarray(a) * np.asarray(b), axis=-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        )
        np.testing.assert_allclose(d, np.arccos(np.clip(cos, -1, 1)), rtol=1e-7)

    def test_stable_for_tiny_angles(self):
        a = jnp.asarray([1.0, 0.0, 0.0])
        b = jnp.asarray([1.0, 1e-9, 0.0])
        d = projective_plane_angle_distance(a, b)
        np.testing.assert_allclose(d, 1e-9, rtol=1e-5)

    def test_scale_invariance(self, rng):
        a = jnp.asarray(rng.normal(size=(8, 3)))
        b = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            projective_plane_angle_distance(1e6 * a, 1e-6 * b),
            projective_plane_angle_distance(a, b),
            rtol=1e-9,
        )

    def test_keepdim(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 3)))
        out = projective_plane_angle_distance(a, a, keepdim=True)
        assert out.shape == (4, 1)

    def test_gradients(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 3)))
        b = jnp.asarray(rng.normal(size=(4, 3)))
        check_grads(
            projective_plane_angle_distance, (a, b), order=1, atol=1e-5, rtol=1e-5
        )


class TestCosineDistance:
    def test_parallel_zero(self, rng):
        v = jnp.asarray(rng.normal(size=(8, 3)))
        np.testing.assert_allclose(
            projective_plane_cosine_distance(v, 3.0 * v), np.zeros(8), atol=1e-10
        )

    def test_opposite_two(self):
        d = projective_plane_cosine_distance(
            jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, 0.0, -2.0])
        )
        np.testing.assert_allclose(d, 2.0, rtol=1e-10)

    def test_relation_to_angle(self, rng):
        a = jnp.asarray(rng.normal(size=(8, 3)))
        b = jnp.asarray(rng.normal(size=(8, 3)))
        angle = projective_plane_angle_distance(a, b)
        np.testing.assert_allclose(
            projective_plane_cosine_distance(a, b), 1.0 - np.cos(angle), rtol=1e-7, atol=1e-9
        )
