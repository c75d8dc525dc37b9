"""Gen-1 object protocol: PinholeCameraModelL1 + protocol BFGS solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    PinholeBAConfig,
    PinholeBAData,
    PinholeBAParams,
    PinholeCameraModelL1,
    ba_error,
    ba_project,
    num_ba_parameters,
)
from davo_tpu.solve import BFGSCameraSolverConfig, bfgs_solve_function

M, N = 3, 6
P = num_ba_parameters(M, N)


def _model(rng, batch=2, estimates=2, noise=0.0):
    def arr(*shape):
        return jnp.asarray(rng.normal(size=(batch, estimates) + shape))

    params = PinholeBAParams(
        focal_length=1.2 + 0.1 * arr(),
        cx=0.05 * arr(),
        cy=0.05 * arr(),
        translation=0.3 * arr(M, 3).at[..., 2].add(5.0),
        orientation=0.1 * arr(M, 3),
        world_points=jnp.concatenate(
            [0.5 * arr(N - 2, 2), 3.0 + 0.2 * jnp.abs(arr(N - 2, 1))], axis=-1
        ),
    )
    uv = ba_project(params)
    data = PinholeBAData(
        true_projected_points=uv,
        visibility_mask=jnp.ones((batch, estimates, M, N), dtype=bool),
    )
    if noise:
        params = params._replace(
            translation=params.translation + noise,
            world_points=params.world_points + noise,
        )
    return PinholeCameraModelL1(params=params, data=data)


class TestProtocol:
    def test_shapes(self, rng):
        model = _model(rng)
        assert model.batch_size == 2
        assert model.num_estimates == 2
        assert model.num_parameters == P
        assert model.get_error().shape == (2, 2)
        assert model.get_gradient().shape == (2, 2, P)
        assert model.as_parameters_vector().shape == (2, 2, P)

    def test_add_shifts_parameters(self, rng):
        model = _model(rng)
        delta = jnp.asarray(rng.normal(size=(2, 2, P)) * 0.01)
        shifted = model.add(delta)
        np.testing.assert_allclose(
            shifted.as_parameters_vector(),
            model.as_parameters_vector() + delta,
            rtol=1e-9,
            atol=1e-12,
        )

    def test_masked_update(self, rng):
        a = _model(rng)
        b = a.add(jnp.ones((2, 2, P)))
        mask = jnp.asarray([[True, False], [False, True]])
        merged = a.masked_update(b, mask)
        vec_a = np.asarray(a.as_parameters_vector())
        vec_b = np.asarray(b.as_parameters_vector())
        vec_m = np.asarray(merged.as_parameters_vector())
        np.testing.assert_allclose(vec_m[0, 0], vec_b[0, 0])
        np.testing.assert_allclose(vec_m[0, 1], vec_a[0, 1])
        np.testing.assert_allclose(vec_m[1, 1], vec_b[1, 1])

    def test_is_pytree(self, rng):
        model = _model(rng)
        leaves = jax.tree_util.tree_leaves(model)
        assert len(leaves) > 0
        out = jax.jit(lambda f: f.get_error())(model)
        np.testing.assert_allclose(out, model.get_error(), rtol=1e-7, atol=1e-12)

    def test_gradient_matches_functional_core(self, rng):
        model = _model(rng, noise=0.05)
        _, grad = model.get_error_and_gradient()
        np.testing.assert_allclose(model.get_gradient(), grad, rtol=1e-10)


class TestProtocolSolver:
    def test_reduces_error(self, rng):
        model = _model(rng, noise=0.02)
        start = np.asarray(model.get_error())
        solved = bfgs_solve_function(
            model, BFGSCameraSolverConfig(max_iterations=8)
        )
        end = np.asarray(solved.get_error())
        assert np.all(end <= start + 1e-9)
        assert end.mean() < 0.2 * start.mean()

    def test_parallel_estimates_solved_independently(self, rng):
        model = _model(rng, estimates=3, noise=0.02)
        solved = bfgs_solve_function(
            model, BFGSCameraSolverConfig(max_iterations=6)
        )
        assert solved.get_error().shape == (2, 3)
        assert np.all(np.isfinite(solved.get_error()))

    def test_jit_compiles(self, rng):
        model = _model(rng, noise=0.02)
        solved = jax.jit(
            lambda m: bfgs_solve_function(
                m, BFGSCameraSolverConfig(max_iterations=3)
            )
        )(model)
        assert np.all(np.isfinite(solved.get_error()))
