"""L-BFGS solver: landscape convergence, history semantics, contract.

Beyond-reference solver (the reference has full BFGS only); the batteries
mirror ``tests/solve/test_bfgs.py`` so both solvers are held to the same
behavioural contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.solve import BFGSConfig, LBFGSConfig, bfgs_solve, lbfgs_solve

from .reference_functions import (
    square_error,
    log_square_error,
    rosenbrock_function,
    beale_function,
)

EVAL_CFG = LBFGSConfig(error_threshold=1e-8, iterations=100, drop_path_p=0.0)


class TestConvergence:
    def test_sphere(self, rng):
        x0 = jnp.asarray(rng.normal(size=(8, 4)) * 3.0)
        out = lbfgs_solve(square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_log_sphere(self, rng):
        x0 = jnp.asarray(rng.normal(size=(8, 3)) * 2.0)
        out = lbfgs_solve(log_square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_rosenbrock(self, rng):
        x0 = jnp.asarray(rng.normal(size=(6, 2)) * 0.5)
        cfg = LBFGSConfig(
            error_threshold=1e-10, iterations=300, drop_path_p=0.0
        )
        out = lbfgs_solve(rosenbrock_function, x0, cfg)
        np.testing.assert_allclose(out, np.ones_like(x0), atol=0.02)

    def test_beale(self, rng):
        x0 = jnp.asarray([[2.5, 0.3], [3.5, 0.8], [2.8, 0.2]])
        cfg = LBFGSConfig(
            error_threshold=1e-12, iterations=200, drop_path_p=0.0
        )
        out = lbfgs_solve(beale_function, x0, cfg)
        np.testing.assert_allclose(
            out, np.broadcast_to([3.0, 0.5], out.shape), atol=0.02
        )

    def test_short_history_still_converges(self, rng):
        x0 = jnp.asarray(rng.normal(size=(4, 6)) * 2.0)
        cfg = LBFGSConfig(
            history=2, error_threshold=1e-10, iterations=200, drop_path_p=0.0
        )
        out = lbfgs_solve(square_error, x0, cfg)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_history_wraps_past_m_iterations(self, rng):
        # more iterations than history slots: the shifted buffer must keep
        # producing descent directions (Rosenbrock needs > m good steps)
        x0 = jnp.asarray(rng.normal(size=(4, 2)) * 0.5)
        cfg = LBFGSConfig(
            history=3, error_threshold=1e-12, iterations=300, drop_path_p=0.0
        )
        out = lbfgs_solve(rosenbrock_function, x0, cfg)
        np.testing.assert_allclose(out, np.ones_like(x0), atol=0.05)


class TestAgreementWithBFGS:
    def test_full_history_matches_bfgs_on_quadratic(self, rng):
        """With history >= iteration count both methods build the same
        curvature information on a quadratic bowl; minima must agree."""
        x0 = jnp.asarray(rng.normal(size=(8, 5)) * 3.0)
        b_out = bfgs_solve(
            square_error,
            x0,
            BFGSConfig(error_threshold=1e-12, iterations=40, drop_path_p=0.0),
        )
        l_out = lbfgs_solve(
            square_error,
            x0,
            LBFGSConfig(
                history=40,
                error_threshold=1e-12,
                iterations=40,
                drop_path_p=0.0,
            ),
        )
        np.testing.assert_allclose(l_out, b_out, atol=1e-5)


class TestActiveSetSemantics:
    def test_converged_elements_freeze(self):
        x0 = jnp.asarray([[0.0, 0.0], [2.0, -1.0]])
        out = lbfgs_solve(
            square_error,
            x0,
            LBFGSConfig(error_threshold=1e-6, iterations=50, drop_path_p=0.0),
        )
        np.testing.assert_allclose(out[0], [0.0, 0.0], atol=0)
        np.testing.assert_allclose(out[1], [0.0, 0.0], atol=1e-4)

    def test_multi_dim_batch(self, rng):
        x0 = jnp.asarray(rng.normal(size=(3, 4, 3)) * 2.0)
        out = lbfgs_solve(square_error, x0, EVAL_CFG)
        np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)

    def test_negative_curvature_pair_skipped(self):
        # a concave region: pairs with y.s <= 0 must become rho = 0
        # identity slots, not corrupt the direction with wrong curvature
        def concave_then_convex(x):
            return jnp.sum(jnp.square(jnp.square(x) - 1.0), axis=-1)

        x0 = jnp.asarray([[0.1, -0.1], [0.2, 0.05]])
        out = lbfgs_solve(
            concave_then_convex,
            x0,
            LBFGSConfig(error_threshold=1e-10, iterations=100, drop_path_p=0.0),
        )
        np.testing.assert_allclose(
            np.abs(np.asarray(out)), np.ones_like(out), atol=1e-3
        )


class TestDifferentiability:
    def test_eval_result_has_zero_gradient(self, rng):
        x0 = jnp.asarray(rng.normal(size=(4, 3)))

        def loss(x):
            return jnp.sum(lbfgs_solve(square_error, x, EVAL_CFG))

        np.testing.assert_allclose(jax.grad(loss)(x0), np.zeros_like(x0))

    def test_training_mode_propagates_gradients(self, rng):
        x0 = jnp.asarray(rng.normal(size=(4, 3)))
        target = jnp.asarray(rng.normal(size=(3,)))

        def err(x):
            return jnp.sum(jnp.square(x - target), axis=-1)

        cfg = LBFGSConfig(
            error_threshold=1e-10,
            iterations=5,
            drop_path_p=0.0,
            minimum_step=0.0,
        )

        def loss(x):
            return jnp.sum(
                jnp.square(lbfgs_solve(err, x, cfg, training=True))
            )

        g = jax.grad(loss)(x0)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_drop_path_needs_key(self):
        x0 = jnp.zeros((2, 2))
        with pytest.raises(ValueError):
            lbfgs_solve(
                square_error,
                x0,
                LBFGSConfig(drop_path_p=0.5),
                training=True,
            )


def test_jit_compiles(rng):
    x0 = jnp.asarray(rng.normal(size=(4, 3)))
    out = jax.jit(lambda x: lbfgs_solve(square_error, x, EVAL_CFG))(x0)
    np.testing.assert_allclose(out, np.zeros_like(x0), atol=1e-4)
