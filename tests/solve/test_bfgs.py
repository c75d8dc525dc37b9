"""BFGS solver correctness on the canonical landscapes + contract tests.

Mirrors ``tests/autograd_solvers/test_bfgs_solver.py`` in the reference:
convergence to known minima, monotone improvement when iteration-starved,
Hessian-update algebra vs the textbook formula, differentiability contract
(eval result carries no gradient; training mode lets gradients flow), and a
noisy plane-fitting regression task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.solve import (
    BFGSConfig,
    bfgs_solve,
    update_inverse_hessian,
    scale_initial_inverse_hessian,
)

from .reference_functions import (
    square_error,
    log_square_error,
    rosenbrock_function,
    rastrigin_function,
    beale_function,
    easom_function,
)

EVAL_CFG = BFGSConfig(error_threshold=1e-8, iterations=100, drop_path_p=0.0)


class TestConvergence:
    def test_sphere(self, rng):
        x0 = jnp.asarray(rng.normal(size=(8, 4)) * 3.0)
        out = bfgs_solve(square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_log_sphere(self, rng):
        x0 = jnp.asarray(rng.normal(size=(8, 3)) * 2.0)
        out = bfgs_solve(log_square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_rosenbrock(self, rng):
        x0 = jnp.asarray(rng.normal(size=(6, 2)) * 0.5)
        cfg = BFGSConfig(error_threshold=1e-10, iterations=300, drop_path_p=0.0)
        out = bfgs_solve(rosenbrock_function, x0, cfg)
        np.testing.assert_allclose(out, np.ones_like(x0), atol=0.02)

    def test_warm_start_line_search_matches(self, rng):
        # warm-starting alpha from the previous accepted step must reach
        # the same minima (sphere + rosenbrock), including with a tight
        # probe cap where the cold start degrades
        x0 = jnp.asarray(rng.normal(size=(8, 4)) * 3.0)
        cfg = BFGSConfig(
            error_threshold=1e-8,
            iterations=100,
            drop_path_p=0.0,
            warm_start_line_search=True,
            line_search_iterations=5,
        )
        out = bfgs_solve(square_error, x0, cfg)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)
        x1 = jnp.asarray(rng.normal(size=(6, 2)) * 0.5)
        cfg_r = BFGSConfig(
            error_threshold=1e-10,
            iterations=300,
            drop_path_p=0.0,
            warm_start_line_search=True,
        )
        out_r = bfgs_solve(rosenbrock_function, x1, cfg_r)
        np.testing.assert_allclose(out_r, np.ones_like(x1), atol=0.02)

    def test_beale(self, rng):
        x0 = jnp.asarray([[2.5, 0.3], [3.5, 0.8], [2.8, 0.2]])
        cfg = BFGSConfig(error_threshold=1e-12, iterations=200, drop_path_p=0.0)
        out = bfgs_solve(beale_function, x0, cfg)
        np.testing.assert_allclose(
            out, np.broadcast_to([3.0, 0.5], out.shape), atol=0.02
        )

    def test_rastrigin_traps_in_local_minima(self, rng):
        # Far from the origin BFGS lands in a local minimum: the value must
        # still improve, and land on a lattice point of the local minima.
        x0 = jnp.asarray([[2.6, 2.6]])
        out = bfgs_solve(rastrigin_function, x0, EVAL_CFG)
        assert float(rastrigin_function(out)[0]) <= float(
            rastrigin_function(x0)[0]
        )
        np.testing.assert_allclose(
            out, np.round(np.asarray(out)), atol=0.1
        )

    def test_rastrigin_near_origin_converges(self):
        x0 = jnp.asarray([[0.1, -0.15]])
        out = bfgs_solve(rastrigin_function, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros((1, 2)), atol=1e-3)

    def test_easom_converges_near_minimum(self):
        x0 = jnp.asarray([[2.8, 3.4]])
        cfg = BFGSConfig(error_threshold=-2.0, iterations=100, drop_path_p=0.0)
        out = bfgs_solve(easom_function, x0, cfg)
        np.testing.assert_allclose(
            out, np.asarray([[np.pi, np.pi]]), atol=1e-3
        )

    def test_monotone_improvement_when_iteration_starved(self, rng):
        x0 = jnp.asarray(rng.normal(size=(8, 2)) * 0.5)
        cfg = BFGSConfig(error_threshold=1e-12, iterations=3, drop_path_p=0.0)
        out = bfgs_solve(rosenbrock_function, x0, cfg)
        assert np.all(
            np.asarray(rosenbrock_function(out))
            <= np.asarray(rosenbrock_function(x0)) + 1e-12
        )

    def test_already_converged_does_not_move(self):
        x0 = jnp.zeros((3, 4))
        out = bfgs_solve(square_error, x0, EVAL_CFG)
        np.testing.assert_array_equal(out, x0)

    def test_noisy_plane_fit(self, rng):
        # Fit z = ax + by + c to noisy samples, one problem per batch row.
        true = jnp.asarray(rng.normal(size=(4, 3)))
        xy = jnp.asarray(rng.normal(size=(4, 32, 2)))
        z = (
            true[:, 0:1] * xy[..., 0]
            + true[:, 1:2] * xy[..., 1]
            + true[:, 2:3]
            + 0.01 * jnp.asarray(rng.normal(size=(4, 32)))
        )

        def error_fn(params):
            pred = (
                params[..., 0:1] * xy[..., 0]
                + params[..., 1:2] * xy[..., 1]
                + params[..., 2:3]
            )
            return jnp.mean(jnp.square(pred - z), axis=-1)

        cfg = BFGSConfig(error_threshold=1e-4, iterations=100, drop_path_p=0.0)
        out = bfgs_solve(error_fn, jnp.zeros((4, 3)), cfg)
        np.testing.assert_allclose(out, true, atol=0.05)


class TestActiveSetSemantics:
    def test_converged_elements_freeze(self):
        # One element starts at the minimum, the other far away; the
        # converged one must remain bit-identical to its start.
        x0 = jnp.asarray([[0.0, 0.0], [5.0, -3.0]])
        cfg = BFGSConfig(error_threshold=1e-6, iterations=50, drop_path_p=0.0)
        out = bfgs_solve(square_error, x0, cfg)
        np.testing.assert_array_equal(out[0], x0[0])
        np.testing.assert_allclose(out[1], np.zeros(2), atol=1e-3)

    def test_multi_dim_batch(self, rng):
        x0 = jnp.asarray(rng.normal(size=(2, 3, 4)))
        out = bfgs_solve(square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)


class TestDifferentiability:
    def test_eval_result_has_zero_gradient(self, rng):
        x0 = jnp.asarray(rng.normal(size=(4, 3)))
        g = jax.grad(
            lambda x: bfgs_solve(square_error, x, EVAL_CFG).sum()
        )(x0)
        np.testing.assert_array_equal(g, np.zeros_like(x0))

    def test_training_mode_propagates_gradients(self, rng):
        # A few iterations on shifted Rosenbrock do not converge, so the
        # result still depends on the start point: gradients must flow.
        t = jnp.asarray(rng.normal(size=(4, 2)) * 0.1)

        def solve_sum(x0):
            cfg = BFGSConfig(
                error_threshold=1e-12,
                iterations=2,
                drop_path_p=0.0,
                line_search_iterations=20,
            )
            fn = lambda x: rosenbrock_function(x - t)
            return bfgs_solve(fn, x0, cfg, training=True).sum()

        g = jax.grad(solve_sum)(jnp.asarray(rng.normal(size=(4, 2)) * 0.3))
        assert np.all(np.isfinite(g))
        assert np.any(np.asarray(g) != 0.0)

    def test_training_fully_converged_gradient_is_small(self, rng):
        # Iterating to convergence makes the output independent of the
        # input: gradients vanish (the motivation for drop-path).
        t = jnp.asarray(rng.normal(size=(2, 2)))

        def solve_sum(x0):
            cfg = BFGSConfig(
                error_threshold=1e-14, iterations=60, drop_path_p=0.0
            )
            fn = lambda x: jnp.sum(jnp.square(x - t), axis=-1)
            return bfgs_solve(fn, x0, cfg, training=True).sum()

        g = jax.grad(solve_sum)(t + 0.5)
        np.testing.assert_allclose(g, np.zeros((2, 2)), atol=1e-4)

    def test_drop_path_needs_key(self):
        with pytest.raises(ValueError):
            bfgs_solve(
                square_error,
                jnp.ones((2, 2)),
                BFGSConfig(drop_path_p=0.5),
                training=True,
            )

    def test_drop_path_statistical_freeze(self, key):
        # With p ~ 1 nearly every element freezes on the first iteration.
        cfg = BFGSConfig(
            error_threshold=1e-12,
            iterations=5,
            drop_path_p=0.999,
            training_iterations=5,
        )
        x0 = jnp.ones((64, 2))
        out = bfgs_solve(square_error, x0, cfg, training=True, key=key)
        frozen = np.all(np.asarray(out) == 1.0, axis=-1)
        assert frozen.mean() > 0.9

    def test_return_second_last_lags_one_step(self, rng):
        t = jnp.zeros((1, 2))
        fn = lambda x: jnp.sum(jnp.square(x), axis=-1)
        cfg_last = BFGSConfig(
            error_threshold=1e-10, iterations=2, drop_path_p=0.0
        )
        cfg_second = BFGSConfig(
            error_threshold=1e-10,
            iterations=2,
            drop_path_p=0.0,
            return_second_last=True,
        )
        x0 = jnp.asarray([[4.0, -2.0]])
        out_last = bfgs_solve(fn, x0, cfg_last, training=True)
        out_second = bfgs_solve(fn, x0, cfg_second, training=True)
        # The second-last variant must be at least one step behind.
        assert float(fn(out_second)[0]) >= float(fn(out_last)[0]) - 1e-12

    def test_training_thresholds_apply(self, rng):
        x0 = jnp.asarray(rng.normal(size=(4, 3)) * 2.0)
        cfg = BFGSConfig(
            error_threshold=1e-10,
            iterations=100,
            drop_path_p=0.0,
            training_iterations=0,
        )
        out = bfgs_solve(square_error, x0, cfg, training=True)
        np.testing.assert_array_equal(out, x0)  # zero iterations: unchanged


class TestHessianUpdate:
    def test_matches_textbook_formula(self, rng):
        p = 5
        H = np.eye(p) + 0.1 * rng.normal(size=(p, p))
        H = (H + H.T) / 2
        s = rng.normal(size=p)
        y = s + 0.2 * rng.normal(size=p)
        if float(s @ y) <= 0:
            y = -y
        rho = 1.0 / (y @ s)
        V = np.eye(p) - rho * np.outer(s, y)
        expected = V @ H @ V.T + rho * np.outer(s, s)
        actual = update_inverse_hessian(
            jnp.asarray(H)[None], jnp.asarray(s)[None], jnp.asarray(y)[None]
        )[0]
        np.testing.assert_allclose(actual, expected, rtol=1e-8, atol=1e-10)

    def test_skipped_on_nonpositive_curvature(self, rng):
        p = 4
        H = jnp.eye(p)[None]
        s = jnp.asarray(rng.normal(size=(1, p)))
        y = -s  # negative curvature
        out = update_inverse_hessian(H, s, y)
        np.testing.assert_array_equal(out, H)

    def test_preserves_symmetry(self, rng):
        p = 6
        H = np.eye(p)
        s = rng.normal(size=p)
        y = s * 0.7
        out = np.asarray(
            update_inverse_hessian(
                jnp.asarray(H)[None], jnp.asarray(s)[None], jnp.asarray(y)[None]
            )[0]
        )
        np.testing.assert_allclose(out, out.T, atol=1e-10)

    def test_initial_scale_eq_6_20(self, rng):
        s = jnp.asarray(rng.normal(size=(3, 4)))
        y = jnp.asarray(rng.normal(size=(3, 4)))
        scale = scale_initial_inverse_hessian(s, y)
        expected = np.maximum(
            np.sum(np.asarray(s) * np.asarray(y), -1)
            / np.maximum(np.sum(np.asarray(y) ** 2, -1), 1e-5),
            1e-4,
        )
        np.testing.assert_allclose(scale[..., 0], expected, rtol=1e-10)



class TestReducedPrecisionHessian:
    def test_bf16_carry_still_converges(self, rng):
        # Storing the inverse-Hessian loop carry in bfloat16 perturbs the
        # search direction but not the line-searched descent: quadratic
        # bowls still solve to tight tolerance.
        x0 = jnp.asarray(rng.normal(size=(8, 4)) * 3.0, dtype=jnp.float32)
        cfg = BFGSConfig(
            error_threshold=1e-8,
            iterations=100,
            drop_path_p=0.0,
            hessian_dtype="bfloat16",
        )
        out = bfgs_solve(square_error, x0, cfg)
        assert out.dtype == x0.dtype  # parameters keep their precision
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_bf16_carry_rosenbrock(self, rng):
        # Rosenbrock's curved valley is sensitive to H precision: with a
        # bf16 carry an occasional element stalls short of the minimum, so
        # assert improvement everywhere + convergence for the majority
        # rather than uniform arrival.
        x0 = jnp.asarray(rng.normal(size=(6, 2)) * 0.5, dtype=jnp.float32)
        cfg = BFGSConfig(
            error_threshold=1e-10,
            iterations=300,
            drop_path_p=0.0,
            hessian_dtype="bfloat16",
        )
        out = bfgs_solve(rosenbrock_function, x0, cfg)
        assert np.all(
            np.asarray(rosenbrock_function(out))
            < np.asarray(rosenbrock_function(x0))
        )
        dist = np.linalg.norm(np.asarray(out) - 1.0, axis=-1)
        assert np.median(dist) < 0.02
        assert np.mean(dist < 0.05) >= 0.8

def test_jit_compiles(rng):
    x0 = jnp.asarray(rng.normal(size=(4, 3)))
    out = jax.jit(
        lambda x: bfgs_solve(square_error, x, EVAL_CFG)
    )(x0)
    np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)
