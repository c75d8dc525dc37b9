"""End-to-end optimisation property tests: recover calibration parameters
by minimising projective-plane distance objectives with SGD and BFGS.

Mirrors the reference battery
(``tests/geometry/test_optimisation_of_angle_distance.py:29-218``):
recovery from perturbed starts, behind-the-camera initialisations, and
gauge-ambiguity assertions (recovery up to scale).

Note on objectives: the *angle* distance is L1-like (kinked) at an exact
match, so solvers stall at small-but-nonzero error; the *cosine* distance
is smooth at zero and supports tight recovery tolerances.  Both are
exercised.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    calibration_error,
    get_camera_relative_points,
    unpack_calibration_parameters,
)
from davo_tpu.geometry import (
    pixel_coordinates_to_homogeneous,
    projective_plane_cosine_distance,
)
from davo_tpu.solve import BFGSConfig, SGDConfig, bfgs_solve, sgd_solve

M, N = 3, 6

BFGS_CFG = BFGSConfig(
    error_threshold=1e-14,
    iterations=200,
    drop_path_p=0.0,
    line_search_iterations=40,
)


def _scene(rng):
    """A well-conditioned ground-truth scene + its flat parameter vector
    (f' = elu(f)+1 focal parametrisation => f_param = f'-1 for f' >= 1)."""
    f_true = 1.5
    intr = np.array([f_true - 1.0, 0.05, -0.05])
    points = np.concatenate(
        [rng.normal(size=(N, 2)) * 1.5, 6.0 + rng.normal(size=(N, 1))], axis=-1
    )
    translations = rng.normal(size=(M - 1, 3)) * 0.4
    rotations = rng.normal(size=(M - 1, 3)) * 0.05
    vec = np.concatenate(
        [intr, points.ravel(), translations.ravel(), rotations.ravel()]
    )
    return jnp.asarray(vec)


def _observations(vec):
    """Project the scene through the model itself: pixels whose rays match
    the camera-relative points exactly (zero objective at the truth)."""
    params = unpack_calibration_parameters(vec[None], M, N)
    rel = get_camera_relative_points(
        params.world_points, params.camera_translations, params.camera_rotations
    )[0]
    f = jax.nn.elu(vec[0]) + 1.0
    u = f * rel[..., 0] / rel[..., 2] + vec[1]
    v = f * rel[..., 1] / rel[..., 2] + vec[2]
    pixels = jnp.stack([u, v], axis=-1)
    vis = jnp.ones((M, N))
    return pixels[None], vis[None]


def _angle_err_fn(pixels, vis):
    return lambda p: calibration_error(p, pixels, vis)


def _cosine_err_fn(pixels, vis):
    def fn(parameters):
        params = unpack_calibration_parameters(parameters, M, N)
        rays = pixel_coordinates_to_homogeneous(pixels, params.intrinsics)
        rel = get_camera_relative_points(
            params.world_points,
            params.camera_translations,
            params.camera_rotations,
        )
        d = projective_plane_cosine_distance(rays, rel)
        return jnp.sum(d * vis, axis=(-1, -2))

    return fn


class TestBFGSRecovery:
    def test_angle_objective_large_reduction(self, rng):
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None] + 0.01 * jnp.asarray(rng.normal(size=vec.shape))
        fn = _angle_err_fn(pixels, vis)
        solved = bfgs_solve(fn, start, BFGS_CFG)
        # the angle objective is kinked at zero: expect a large reduction,
        # not machine-precision convergence
        assert float(fn(solved)[0]) < float(fn(start)[0]) * 1e-2

    def test_cosine_objective_tight_recovery(self, rng):
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None] + 0.01 * jnp.asarray(rng.normal(size=vec.shape))
        fn = _cosine_err_fn(pixels, vis)
        solved = bfgs_solve(fn, start, BFGS_CFG)
        assert float(fn(solved)[0]) < 1e-9

    def test_recovered_scene_matches_up_to_scale(self, rng):
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None] + 0.005 * jnp.asarray(rng.normal(size=vec.shape))
        fn = _cosine_err_fn(pixels, vis)
        solved = bfgs_solve(fn, start, BFGS_CFG)[0]
        true_p = unpack_calibration_parameters(vec, M, N)
        got_p = unpack_calibration_parameters(solved, M, N)
        # intrinsics are gauge-free: recovered directly
        np.testing.assert_allclose(
            got_p.intrinsics.ravel(), true_p.intrinsics.ravel(), atol=5e-3
        )
        # structure recovered up to a single global scale
        ratio = np.asarray(got_p.world_points).ravel() / np.asarray(
            true_p.world_points
        ).ravel()
        np.testing.assert_allclose(ratio, ratio.mean(), atol=5e-3)

    def test_far_in_front_initialisation(self, rng):
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None].at[0, 3 + 2 : 3 + 3 * N : 3].mul(5.0)  # z 5x too far
        fn = _cosine_err_fn(pixels, vis)
        solved = bfgs_solve(fn, start, BFGS_CFG)
        assert float(fn(solved)[0]) < float(fn(start)[0]) * 1e-2

    def test_behind_camera_point_recovers_with_noise(self, rng):
        # flipping one point with everything else exact creates a kinked
        # local minimum of the angle objective; with realistic noise on
        # the whole start the landscape is smooth and recovery proceeds
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None] + 0.02 * jnp.asarray(rng.normal(size=vec.shape))
        start = start.at[0, 3 + 2].set(-1.0)
        fn = _cosine_err_fn(pixels, vis)
        solved = bfgs_solve(fn, start, BFGS_CFG)
        assert float(fn(solved)[0]) < float(fn(start)[0]) * 1e-2
        # the flipped point ends up back in front of the camera
        z = float(solved[0, 3 + 2])
        assert z > 0.0, z


class TestSGDRecovery:
    def test_descends_from_perturbation(self, rng):
        vec = _scene(rng)
        pixels, vis = _observations(vec)
        start = vec[None] + 0.01 * jnp.asarray(rng.normal(size=vec.shape))
        fn = _cosine_err_fn(pixels, vis)
        solved = sgd_solve(
            fn, start, SGDConfig(learning_rate=2e-2, iterations=500)
        )
        assert float(fn(solved)[0]) < float(fn(start)[0]) * 0.1


def test_exact_match_gradient_is_finite(rng):
    # the regression that motivated safe_norm: exactly-matched
    # observations must not produce NaN objective gradients
    vec = _scene(rng)
    pixels, vis = _observations(vec)
    fn = _angle_err_fn(pixels, vis)
    g = jax.grad(lambda p: fn(p).sum())(vec[None])
    assert np.all(np.isfinite(g))


# ---------------------------------------------------------------------------
# Sub-problem batteries mirroring the reference's remaining scenarios
# (``tests/geometry/test_optimisation_of_angle_distance.py:29-218``):
# intrinsics-only and world-point-only recovery through the homogeneous
# projection + angle distance, including behind-camera / far-in-front /
# random starts and scale-ambiguity assertions.
# ---------------------------------------------------------------------------

from davo_tpu.geometry import (  # noqa: E402
    project_points_pinhole_homogeneous,
    projective_plane_angle_distance,
)

POINT_CFG = BFGSConfig(
    error_threshold=1e-16,
    iterations=500,
    minimum_step=1e-12,
    drop_path_p=0.0,
    line_search_iterations=40,
)


def test_intrinsics_recovered_by_sgd():
    points = jnp.asarray(
        [[1.0, 1.0, 14.0], [1.0, -1.0, 14.0], [-1.0, 1.0, 14.0], [-1.0, -1.0, 14.0]]
    )
    true_intrinsics = jnp.asarray([[0.9, -0.12, 0.07]])
    start = jnp.asarray([[1.0, -0.05, 0.18]])
    true_proj = project_points_pinhole_homogeneous(points, true_intrinsics)

    def fn(intr):
        proj = project_points_pinhole_homogeneous(
            points[None], intr[:, None, :]
        )
        return jnp.sum(
            projective_plane_angle_distance(true_proj[None], proj), axis=-1
        )

    solved = sgd_solve(fn, start, SGDConfig(learning_rate=2e-4, iterations=4000))
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_intrinsics), atol=5e-4
    )


def test_intrinsics_recovered_by_bfgs_from_far_start():
    # a 3x3 depth-varying point grid; the start is wildly wrong in all
    # three intrinsics (the reference's hardest intrinsics case)
    xs = [-1.0, 0.0, 1.0]
    points = jnp.asarray(
        [[x, y, 12.0 + 2.0 * x + y] for x in xs for y in xs]
    )
    true_intrinsics = jnp.asarray([[1.3, -0.3, 0.1]])
    start = jnp.asarray([[-2.0, 0.8, -1.7]])
    true_proj = project_points_pinhole_homogeneous(points, true_intrinsics)

    def fn(intr):
        proj = project_points_pinhole_homogeneous(
            points[None], intr[:, None, :]
        )
        return jnp.sum(
            projective_plane_angle_distance(true_proj[None], proj), axis=-1
        )

    solved = bfgs_solve(fn, start, POINT_CFG)
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_intrinsics), atol=1e-4
    )


def _point_error_fn(view_offsets, intrinsics, true_proj):
    def fn(points):
        proj = project_points_pinhole_homogeneous(
            points[:, None, :] + view_offsets[None], intrinsics
        )
        return jnp.sum(
            projective_plane_angle_distance(proj, true_proj), axis=-1
        )

    return fn


def test_single_position_point_recovery_is_scale_ambiguous():
    # several cameras at the SAME position (different intrinsics) cannot
    # resolve depth: the recovered point matches only up to a scale
    intrinsics = jnp.asarray(
        [[-0.6, 0.1, -0.8], [1.4, -0.3, -0.2], [0.8, 0.0, -0.1], [-2.0, -0.1, 0.0]]
    )
    true_point = jnp.asarray([[1.1, 0.8, 17.3]])
    start = jnp.asarray([[-2.3, 0.35, 3.5]])
    true_proj = project_points_pinhole_homogeneous(true_point, intrinsics)

    def fn(points):
        proj = project_points_pinhole_homogeneous(
            points[:, None, :], intrinsics[None]
        )
        return jnp.sum(
            projective_plane_angle_distance(proj, true_proj[None]), axis=-1
        )

    solved = bfgs_solve(fn, start, POINT_CFG)
    ratio = np.asarray(solved[0]) / np.asarray(true_point[0])
    assert not np.allclose(np.asarray(solved[0]), np.asarray(true_point[0]), atol=0.5)
    np.testing.assert_allclose(ratio, ratio.mean(), atol=1e-6)


def test_stereo_offset_resolves_scale():
    intrinsics = jnp.asarray([0.787, -0.13, -0.02])
    offsets = jnp.asarray([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    true_point = jnp.asarray([[1.1, 0.8, 17.3]])
    start = jnp.asarray([[-2.3, 0.35, 3.5]])
    true_proj = project_points_pinhole_homogeneous(
        true_point[:, None, :] + offsets[None], intrinsics
    )
    fn = _point_error_fn(offsets, intrinsics, true_proj)
    solved = bfgs_solve(fn, start, POINT_CFG)
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_point), atol=1e-5
    )


def test_point_recovery_from_behind_the_camera():
    intrinsics = jnp.asarray([0.08, -0.13, -0.02])
    offsets = jnp.asarray(
        [[0.0, 0.0, 0.0], [1.5, 0.1, -0.1], [-1.5, -0.3, 0.11]]
    )
    true_point = jnp.asarray([[1.1, 0.8, 17.3]])
    start = jnp.asarray([[-2.3, 0.35, -3.5]])  # starts BEHIND the cameras
    true_proj = project_points_pinhole_homogeneous(
        true_point[:, None, :] + offsets[None], intrinsics
    )
    fn = _point_error_fn(offsets, intrinsics, true_proj)
    solved = bfgs_solve(fn, start, POINT_CFG)
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_point), atol=1e-5
    )


def test_point_recovery_from_far_in_front():
    intrinsics = jnp.asarray([0.08, -0.13, -0.02])
    offsets = jnp.asarray(
        [
            [0.0, 0.0, 0.0],
            [1.5, 0.1, -0.1],
            [-1.5, -0.3, 0.11],
            [-0.1, 1.2, 0.2],
            [0.2, -0.38, 12.0],
            [0.32, 0.41, -2.0],
        ]
    )
    true_point = jnp.asarray([[1.1, 0.8, 17.3]])
    start = jnp.asarray([[-0.34, 0.14, 14159.0]])  # absurdly deep start
    true_proj = project_points_pinhole_homogeneous(
        true_point[:, None, :] + offsets[None], intrinsics
    )
    fn = _point_error_fn(offsets, intrinsics, true_proj)
    solved = bfgs_solve(fn, start, POINT_CFG)
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_point), atol=1e-5
    )


def test_batch_point_recovery_from_unit_normal_starts(rng):
    num_views, num_points = 4, 5
    intrinsics = jnp.asarray(rng.uniform(0.0, 1.0, size=3))
    offsets = jnp.asarray(rng.normal(size=(num_views, 3)))
    true_xy = rng.normal(size=(num_points, 2))
    true_z = rng.gamma(3.0, 5.0, size=(num_points, 1))
    true_points = jnp.asarray(np.concatenate([true_xy, true_z], axis=-1))
    true_proj = project_points_pinhole_homogeneous(
        true_points[:, None, :] + offsets[None], intrinsics
    )
    starts = jnp.asarray(rng.normal(size=(num_points, 3)))
    fn = _point_error_fn(offsets, intrinsics, true_proj)
    solved = bfgs_solve(fn, starts, POINT_CFG)
    np.testing.assert_allclose(
        np.asarray(solved), np.asarray(true_points), atol=1e-5
    )
