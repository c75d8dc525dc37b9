"""Schur-complement bundle adjustment: single-device correctness +
8-virtual-device distributed equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.geometry import rotate_vector_axis_angle
from davo_tpu.parallel import (
    BAProblem,
    BAObservations,
    SchurConfig,
    ba_residuals,
    schur_ba_solve,
    schur_normal_step,
    distributed_schur_ba,
    default_gauge_masks,
    make_mesh,
)

M, N = 4, 16


def _make_problem(rng, noise=0.0):
    points = np.concatenate(
        [rng.normal(size=(N, 2)) * 2.0, 8.0 + rng.normal(size=(N, 1))], axis=-1
    )
    poses = np.zeros((M, 6))
    poses[:, 0:3] = rng.normal(size=(M, 3)) * 0.05
    poses[:, 3:5] = rng.normal(size=(M, 2)) * 0.5
    poses[0] = 0.0  # gauge view
    intrinsics = np.array([1.4, 0.05, -0.05])
    truth = BAProblem(
        intrinsics=jnp.asarray(intrinsics),
        poses=jnp.asarray(poses),
        points=jnp.asarray(points),
    )
    pixels = _project(truth)
    obs = BAObservations(
        pixels=pixels, visibility=jnp.ones((M, N), dtype=bool)
    )
    if noise > 0.0:
        start = BAProblem(
            intrinsics=truth.intrinsics + noise * jnp.asarray(rng.normal(size=3)),
            poses=truth.poses.at[1:].add(
                noise * jnp.asarray(rng.normal(size=(M - 1, 6)))
            ),
            points=truth.points + noise * jnp.asarray(rng.normal(size=(N, 3))),
        )
    else:
        start = truth
    return truth, start, obs


def _project(problem):
    rel = (
        rotate_vector_axis_angle(
            problem.points[None, :, :], problem.poses[:, None, 0:3]
        )
        + problem.poses[:, None, 3:6]
    )
    f, cx, cy = problem.intrinsics
    u = f * rel[..., 0] / rel[..., 2] + cx
    v = f * rel[..., 1] / rel[..., 2] + cy
    return jnp.stack([u, v], axis=-1)


def _cost(problem, obs):
    return float(jnp.sum(jnp.square(ba_residuals(problem, obs))))


class TestSingleDevice:
    def test_zero_residual_at_truth(self, rng):
        truth, _, obs = _make_problem(rng)
        np.testing.assert_allclose(
            ba_residuals(truth, obs), np.zeros((M, N, 2)), atol=1e-10
        )

    def test_one_step_decreases_cost(self, rng):
        truth, start, obs = _make_problem(rng, noise=0.02)
        stepped, _ = schur_normal_step(start, obs, SchurConfig(damping=1e-6))
        assert _cost(stepped, obs) < _cost(start, obs)

    def test_solve_converges_to_truth(self, rng):
        truth, start, obs = _make_problem(rng, noise=0.02)
        solved = schur_ba_solve(
            start, obs, SchurConfig(iterations=15, damping=1e-4)
        )
        assert _cost(solved, obs) < 1e-10

    def test_gauge_dimensions_do_not_move(self, rng):
        _, start, obs = _make_problem(rng, noise=0.02)
        solved = schur_ba_solve(start, obs, SchurConfig(iterations=5))
        np.testing.assert_array_equal(solved.poses[0], start.poses[0])
        np.testing.assert_array_equal(solved.points[0, 2], start.points[0, 2])

    def test_l1_irls_robust_to_outlier(self, rng):
        truth, start, obs = _make_problem(rng, noise=0.01)
        # corrupt one observation badly
        bad_pixels = obs.pixels.at[1, 0].add(5.0)
        bad_obs = BAObservations(pixels=bad_pixels, visibility=obs.visibility)
        l2 = schur_ba_solve(
            start, bad_obs, SchurConfig(iterations=15, loss="l2")
        )
        l1 = schur_ba_solve(
            start, bad_obs, SchurConfig(iterations=15, loss="l1")
        )
        # measure against the uncorrupted observations
        assert _cost(l1, obs) < _cost(l2, obs)

    def test_jit_compiles(self, rng):
        _, start, obs = _make_problem(rng, noise=0.02)
        solved = jax.jit(
            lambda p, o: schur_ba_solve(p, o, SchurConfig(iterations=3))
        )(start, obs)
        assert np.all(np.isfinite(solved.points))


class TestDistributed:
    def test_matches_single_device(self, rng):
        truth, start, obs = _make_problem(rng, noise=0.02)
        mesh = make_mesh(8)
        cfg = SchurConfig(iterations=8, damping=1e-4)
        single = schur_ba_solve(start, obs, cfg)
        distributed = distributed_schur_ba(start, obs, mesh, cfg)
        np.testing.assert_allclose(
            distributed.points, single.points, rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            distributed.poses, single.poses, rtol=1e-5, atol=1e-7
        )
        assert _cost(distributed, obs) < 1e-8

    def test_uneven_shard_raises(self, rng):
        truth, start, obs = _make_problem(rng)
        mesh = make_mesh(8)
        with pytest.raises(ValueError):
            distributed_schur_ba(
                start._replace(points=start.points[:10]),
                BAObservations(
                    pixels=obs.pixels[:, :10], visibility=obs.visibility[:, :10]
                ),
                mesh,
            )

    def test_jit_with_mesh(self, rng):
        _, start, obs = _make_problem(rng, noise=0.02)
        mesh = make_mesh(4)
        cfg = SchurConfig(iterations=3)
        solved = jax.jit(
            lambda p, o: distributed_schur_ba(p, o, mesh, cfg)
        )(start, obs)
        assert np.all(np.isfinite(solved.points))


class TestDistributed2D:
    def _mesh(self, kf, pt):
        devices = np.asarray(jax.devices()[: kf * pt]).reshape(kf, pt)
        from jax.sharding import Mesh

        return Mesh(devices, ("kf", "pt"))

    @pytest.mark.parametrize("kf,pt", [(2, 4), (4, 2)])
    def test_matches_single_device(self, rng, kf, pt):
        from davo_tpu.parallel import distributed_schur_ba_2d

        truth, start, obs = _make_problem(rng, noise=0.02)
        cfg = SchurConfig(iterations=8, damping=1e-4)
        single = schur_ba_solve(start, obs, cfg)
        distributed = distributed_schur_ba_2d(
            start, obs, self._mesh(kf, pt), cfg
        )
        np.testing.assert_allclose(
            distributed.points, single.points, rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            distributed.poses, single.poses, rtol=1e-5, atol=1e-7
        )
        assert _cost(distributed, obs) < 1e-8

    @pytest.mark.slow
    def test_long_sequence_matches_single_device(self, rng):
        # the north-star shape: many keyframes sharded over the mesh
        from davo_tpu.parallel import distributed_schur_ba_2d

        m, n = 16, 32
        points = np.concatenate(
            [rng.normal(size=(n, 2)) * 2.0, 8.0 + rng.normal(size=(n, 1))],
            axis=-1,
        )
        poses = np.zeros((m, 6))
        poses[:, 0:3] = rng.normal(size=(m, 3)) * 0.05
        poses[:, 3:5] = rng.normal(size=(m, 2)) * 0.5
        poses[0] = 0.0
        truth = BAProblem(
            intrinsics=jnp.asarray([1.4, 0.05, -0.05]),
            poses=jnp.asarray(poses),
            points=jnp.asarray(points),
        )
        obs = BAObservations(
            pixels=_project(truth), visibility=jnp.ones((m, n), dtype=bool)
        )
        start = BAProblem(
            intrinsics=truth.intrinsics + 0.02 * jnp.asarray(rng.normal(size=3)),
            poses=truth.poses.at[1:].add(
                0.02 * jnp.asarray(rng.normal(size=(m - 1, 6)))
            ),
            points=truth.points + 0.02 * jnp.asarray(rng.normal(size=(n, 3))),
        )
        cfg = SchurConfig(iterations=8, damping=1e-4)
        single = schur_ba_solve(start, obs, cfg)
        distributed = distributed_schur_ba_2d(
            start, obs, self._mesh(4, 2), cfg
        )
        np.testing.assert_allclose(
            distributed.poses, single.poses, rtol=1e-5, atol=1e-7
        )
        np.testing.assert_allclose(
            distributed.points, single.points, rtol=1e-5, atol=1e-7
        )
        assert _cost(distributed, obs) < 1e-8

    def test_shape_validation(self, rng):
        from davo_tpu.parallel import distributed_schur_ba_2d

        truth, start, obs = _make_problem(rng)
        mesh = self._mesh(2, 4)
        # M = 4 views not divisible by a 3-wide kf axis is impossible here,
        # but N not divisible by (pt * kf) must raise
        with pytest.raises(ValueError):
            distributed_schur_ba_2d(
                start._replace(points=start.points[:12]),
                BAObservations(
                    pixels=obs.pixels[:, :12],
                    visibility=obs.visibility[:, :12],
                ),
                mesh,
            )
