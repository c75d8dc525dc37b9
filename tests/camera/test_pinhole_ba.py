"""Tests for the gauge-fixed pinhole BA objective.

The load-bearing test: the hand-assembled analytic gradient must equal
``jax.grad`` of the error through the flat-vector parametrisation (the
reference validates its 18 partials term-by-term; autodiff cross-checking
covers all of them at once).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    PinholeBAConfig,
    PinholeBAParams,
    PinholeBAData,
    num_ba_parameters,
    ba_params_to_vector,
    ba_params_from_vector,
    ba_add_vector,
    augmented_world_points,
    ba_camera_relative_points,
    ba_project,
    ba_error,
    ba_error_and_gradient,
)

M, N = 3, 6
CFG = PinholeBAConfig()


def _random_params(rng, batch=()):
    def arr(*shape):
        return jnp.asarray(rng.normal(size=batch + shape))

    return PinholeBAParams(
        focal_length=1.0 + 0.2 * arr(),
        cx=0.1 * arr(),
        cy=0.1 * arr(),
        translation=0.5 * arr(M, 3),
        orientation=0.3 * arr(M, 3),
        world_points=jnp.concatenate(
            [0.5 * arr(N - 2, 2), 2.0 + 0.3 * jnp.abs(arr(N - 2, 1))], axis=-1
        ),
    )


def _random_data(rng, batch=()):
    return PinholeBAData(
        true_projected_points=jnp.asarray(
            rng.uniform(-1, 1, size=batch + (M, N, 2))
        ),
        visibility_mask=jnp.asarray(
            rng.uniform(size=batch + (M, N)) > 0.2
        ),
    )


class TestVectorCodec:
    def test_param_count(self):
        assert num_ba_parameters(4, 8) == 3 + 24 + 24 - 7

    def test_roundtrip(self, rng):
        params = _random_params(rng, batch=(2, 3))
        # zero out the gauge-fixed z of the first free point for exactness
        params = params._replace(
            world_points=params.world_points.at[..., 0, 2].set(0.0)
        )
        vec = ba_params_to_vector(params)
        assert vec.shape == (2, 3, num_ba_parameters(M, N))
        back = ba_params_from_vector(vec, M, N)
        for a, b in zip(params, back):
            np.testing.assert_allclose(a, b, atol=1e-12)

    def test_wrong_size_raises(self):
        with pytest.raises(ValueError):
            ba_params_from_vector(jnp.zeros((2, 10)), M, N)

    def test_add_vector(self, rng):
        params = _random_params(rng)
        delta = jnp.asarray(rng.normal(size=num_ba_parameters(M, N)))
        out = ba_add_vector(params, delta)
        np.testing.assert_allclose(
            out.focal_length, params.focal_length + delta[2], rtol=1e-12
        )
        np.testing.assert_allclose(out.cx, params.cx + delta[0], rtol=1e-12)
        # first free point's z is gauge-fixed: the delta never moves it
        np.testing.assert_allclose(
            out.world_points[0, 2], params.world_points[0, 2], rtol=1e-12
        )

    def test_add_constrained_clamps(self, rng):
        params = _random_params(rng)
        delta = jnp.zeros(num_ba_parameters(M, N)).at[2].set(1e6).at[0].set(50.0)
        out = ba_add_vector(
            params, delta, PinholeBAConfig(constrain=True)
        )
        assert float(out.focal_length) <= 1e3
        assert float(out.cx) <= 1.0


class TestGeometry:
    def test_gauge_points(self, rng):
        params = _random_params(rng)
        world = augmented_world_points(params)
        assert world.shape == (N, 3)
        np.testing.assert_array_equal(world[0], np.zeros(3))
        np.testing.assert_array_equal(world[1], [1.0, 0.0, 0.0])
        assert float(world[2, 2]) == 0.0
        np.testing.assert_array_equal(world[3:], params.world_points[1:])

    def test_depth_clamp_enforced(self, rng):
        params = _random_params(rng)
        # Push a camera far forward so points land behind it.
        params = params._replace(
            translation=params.translation.at[..., 2].add(-100.0)
        )
        rel = ba_camera_relative_points(params, CFG)
        min_allowed = np.maximum(
            np.max(np.abs(np.asarray(rel[..., 0:2])), -1)
            / CFG.maximum_pixel_ratio,
            CFG.minimum_z_distance,
        )
        assert np.all(np.asarray(rel[..., 2]) >= min_allowed - 1e-9)

    def test_projection_of_simple_scene(self):
        # Identity view of the gauge points with f=2, c=(0.1, -0.1):
        params = PinholeBAParams(
            focal_length=jnp.asarray(2.0),
            cx=jnp.asarray(0.1),
            cy=jnp.asarray(-0.1),
            translation=jnp.asarray([[0.0, 0.0, 5.0]]),
            orientation=jnp.zeros((1, 3)),
            world_points=jnp.asarray([[0.5, 0.25, 0.0], [1.0, -1.0, 3.0]]),
        )
        uv = ba_project(params, CFG)
        # first point: [0,0,0] + t -> (0, 0, 5) -> (0.1, -0.1)
        np.testing.assert_allclose(uv[0, 0], [0.1, -0.1], atol=1e-7)
        # second point: [1,0,0] + t -> (1, 0, 5) -> (2/5 + .1, -.1)
        np.testing.assert_allclose(uv[0, 1], [0.5, -0.1], atol=1e-7)
        # last point: (1, -1, 8)
        np.testing.assert_allclose(
            uv[0, 4], [2.0 / 8.0 + 0.1, -2.0 / 8.0 - 0.1], atol=1e-7
        )


class TestErrorAndGradient:
    def test_zero_error_at_perfect_projection(self, rng):
        params = _random_params(rng)
        data = PinholeBAData(
            true_projected_points=ba_project(params, CFG),
            visibility_mask=jnp.ones((M, N), dtype=bool),
        )
        err = ba_error(params, data, CFG)
        np.testing.assert_allclose(err, 0.0, atol=1e-10)

    def test_error_scale(self, rng):
        # A single off-by-one residual contributes sqrt(1/(M N)).
        params = _random_params(rng)
        uv = ba_project(params, CFG)
        data = PinholeBAData(
            true_projected_points=uv.at[0, 0, 0].add(1.0),
            visibility_mask=jnp.ones((M, N), dtype=bool),
        )
        err = ba_error(params, data, CFG)
        np.testing.assert_allclose(err, (1.0 / (M * N)) ** 0.5, rtol=1e-6)

    def test_invisible_points_ignored(self, rng):
        params = _random_params(rng)
        uv = ba_project(params, CFG)
        data = PinholeBAData(
            true_projected_points=uv.at[0, 0].add(100.0),
            visibility_mask=jnp.ones((M, N), dtype=bool).at[0, 0].set(False),
        )
        np.testing.assert_allclose(ba_error(params, data, CFG), 0.0, atol=1e-10)

    def test_analytic_gradient_matches_autodiff(self, rng):
        params = _random_params(rng, batch=(4,))
        params = params._replace(
            world_points=params.world_points.at[..., 0, 2].set(0.0)
        )
        data = _random_data(rng, batch=(4,))
        err, grad = ba_error_and_gradient(params, data, CFG)

        def err_from_vec(vec):
            return ba_error(ba_params_from_vector(vec, M, N), data, CFG).sum()

        vec = ba_params_to_vector(params)
        auto = jax.grad(err_from_vec)(vec)
        np.testing.assert_allclose(grad, auto, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(err, ba_error(params, data, CFG), rtol=1e-10)

    @pytest.mark.slow
    def test_analytic_gradient_matches_autodiff_with_clamped_points(self, rng):
        # Points behind the camera exercise the straight-through clamp.
        params = _random_params(rng, batch=(2,))
        params = params._replace(
            world_points=params.world_points.at[..., 0, 2].set(0.0),
            translation=params.translation.at[..., 2].add(-50.0),
        )
        data = _random_data(rng, batch=(2,))
        _, grad = ba_error_and_gradient(params, data, CFG)

        def err_from_vec(vec):
            return ba_error(ba_params_from_vector(vec, M, N), data, CFG).sum()

        auto = jax.grad(err_from_vec)(ba_params_to_vector(params))
        np.testing.assert_allclose(grad, auto, rtol=1e-7, atol=1e-9)

    @pytest.mark.parametrize("norm", ["l2", "mixed"])
    def test_alternative_norms_gradient_matches_autodiff(self, rng, norm):
        cfg = PinholeBAConfig(error_norm=norm)
        params = _random_params(rng, batch=(2,))
        params = params._replace(
            world_points=params.world_points.at[..., 0, 2].set(0.0)
        )
        data = _random_data(rng, batch=(2,))
        err, grad = ba_error_and_gradient(params, data, cfg)

        def err_from_vec(vec):
            return ba_error(ba_params_from_vector(vec, M, N), data, cfg).sum()

        auto = jax.grad(err_from_vec)(ba_params_to_vector(params))
        np.testing.assert_allclose(grad, auto, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(err, ba_error(params, data, cfg), rtol=1e-10)

    def test_unknown_norm_raises(self, rng):
        params = _random_params(rng)
        data = _random_data(rng)
        with pytest.raises(ValueError):
            ba_error(params, data, PinholeBAConfig(error_norm="l3"))

    def test_max_gradient_caps_entries(self, rng):
        params = _random_params(rng)
        # tiny depths make raw gradients huge
        params = params._replace(
            translation=params.translation.at[..., 2].set(0.0),
            world_points=params.world_points.at[..., 2].set(1e-3),
        )
        data = _random_data(rng)
        cfg = PinholeBAConfig(max_gradient=10.0)
        _, grad = ba_error_and_gradient(params, data, cfg)
        assert np.all(np.isfinite(grad))

    def test_gradient_shape(self, rng):
        params = _random_params(rng, batch=(2, 5))
        data = _random_data(rng, batch=(2, 1))  # broadcast over estimates
        err, grad = ba_error_and_gradient(params, data, CFG)
        assert err.shape == (2, 5)
        assert grad.shape == (2, 5, num_ba_parameters(M, N))

    def test_jit_compiles(self, rng):
        params = _random_params(rng, batch=(2,))
        data = _random_data(rng, batch=(2,))
        err, grad = jax.jit(
            lambda p, d: ba_error_and_gradient(p, d, CFG)
        )(params, data)
        assert np.all(np.isfinite(err)) and np.all(np.isfinite(grad))
