"""Parity tests for the fused calibration value/gradient kernels.

The Pallas kernels (run here in interpret mode) and the jnp fallback must
agree with plain autodiff of the channel-major objective, and the fused
objective closures must drive :func:`davo_tpu.solve.bfgs_solve` to the
same result as the plain objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import calibration_error_fast, num_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.ops.calibration_obj import (
    calibration_value_and_dirderiv,
    calibration_value_and_grad,
    make_fused_calibration_objective,
)
from davo_tpu.solve import BFGSConfig, bfgs_solve

M, N = 3, 5
P = num_calibration_parameters(M, N)


def _problem(key, batch):
    cfg = SceneConfig(num_views=M, num_points=N)
    scenes = generate_batch(key, batch, cfg)
    pts = scenes.projected_points.astype(jnp.float32)
    vis = scenes.visibility_mask.astype(jnp.float32)
    guess = 0.1 * jax.random.normal(
        jax.random.fold_in(key, 1), (batch, P), dtype=jnp.float32
    )
    guess = guess.at[:, 0].add(1.0)
    guess = guess.at[:, 3 + 2 : 3 + 3 * N : 3].add(1.0)
    return pts, vis, guess


def _channel_major(pts, vis):
    u_t = jnp.transpose(pts[..., 0], (1, 2, 0))
    v_t = jnp.transpose(pts[..., 1], (1, 2, 0))
    vis_t = jnp.transpose(vis, (1, 2, 0))
    return u_t, v_t, vis_t


def _reference_vg(params, pts, vis):
    err, pullback = jax.vjp(
        lambda q: calibration_error_fast(q, pts, vis), params
    )
    (grad,) = pullback(jnp.ones_like(err))
    return err, grad


@pytest.mark.parametrize(
    "block_b", [pytest.param(8, marks=pytest.mark.slow), 16]
)
def test_value_and_grad_matches_autodiff(key, block_b):
    pts, vis, guess = _problem(key, 16)
    u_t, v_t, vis_t = _channel_major(pts, vis)
    err_k, grad_k = calibration_value_and_grad(
        guess, u_t, v_t, vis_t, block_b=block_b, interpret=True
    )
    err_ref, grad_ref = _reference_vg(guess, pts, vis)
    np.testing.assert_allclose(err_k, err_ref, rtol=5e-5, atol=2e-5)
    np.testing.assert_allclose(grad_k, grad_ref, rtol=5e-4, atol=1e-4)


def test_value_and_dirderiv_matches_jvp(key):
    pts, vis, guess = _problem(key, 16)
    u_t, v_t, vis_t = _channel_major(pts, vis)
    direction = jax.random.normal(
        jax.random.fold_in(key, 2), guess.shape, dtype=jnp.float32
    )
    err_k, dphi_k = calibration_value_and_dirderiv(
        guess, direction, u_t, v_t, vis_t, block_b=8, interpret=True
    )
    err_ref, dphi_ref = jax.jvp(
        lambda q: calibration_error_fast(q, pts, vis), (guess,), (direction,)
    )
    np.testing.assert_allclose(err_k, err_ref, rtol=5e-5, atol=2e-5)
    np.testing.assert_allclose(dphi_k, dphi_ref, rtol=5e-4, atol=1e-4)


@pytest.mark.slow
def test_ineligible_dtype_uses_jnp_fallback(key):
    # f64 parameters are kernel-ineligible: must silently take the jnp
    # path (and still be correct) rather than attempt a Mosaic lowering.
    pts, vis, guess = _problem(key, 8)
    u_t, v_t, vis_t = _channel_major(pts, vis)
    g64 = guess.astype(jnp.float64)
    err, grad = calibration_value_and_grad(
        g64, u_t.astype(jnp.float64), v_t.astype(jnp.float64),
        vis_t.astype(jnp.float64),
    )
    err_ref, grad_ref = _reference_vg(
        g64, pts.astype(jnp.float64), vis.astype(jnp.float64)
    )
    np.testing.assert_allclose(err, err_ref, rtol=1e-12)
    np.testing.assert_allclose(grad, grad_ref, rtol=1e-9, atol=1e-12)


def test_fused_objective_closures_match_plain(key):
    pts, vis, guess = _problem(key, 16)
    error_fn, vg_fn = make_fused_calibration_objective(pts, vis)
    err = error_fn(guess)
    np.testing.assert_allclose(
        err, calibration_error_fast(guess, pts, vis), rtol=2e-5, atol=1e-6
    )
    direction = jax.random.normal(
        jax.random.fold_in(key, 3), guess.shape, dtype=jnp.float32
    )
    # the closure's custom_jvp must route through the dirderiv path
    _, dphi = jax.jvp(error_fn, (guess,), (direction,))
    _, dphi_ref = jax.jvp(
        lambda q: calibration_error_fast(q, pts, vis), (guess,), (direction,)
    )
    np.testing.assert_allclose(dphi, dphi_ref, rtol=5e-4, atol=1e-4)
    err_vg, grad_vg = vg_fn(guess)
    err_ref, grad_ref = _reference_vg(guess, pts, vis)
    np.testing.assert_allclose(err_vg, err_ref, rtol=5e-5, atol=2e-5)
    np.testing.assert_allclose(grad_vg, grad_ref, rtol=5e-4, atol=1e-4)


def test_bfgs_solve_with_fused_objective_matches_plain(key):
    pts, vis, guess = _problem(key, 8)
    cfg = BFGSConfig(
        error_threshold=-1.0,
        iterations=6,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=8,
        fused_hessian_kernel=False,
    )

    def plain(params):
        return calibration_error_fast(params, pts, vis)

    baseline = bfgs_solve(plain, guess, cfg)
    error_fn, vg_fn = make_fused_calibration_objective(pts, vis)
    fused = bfgs_solve(error_fn, guess, cfg, value_and_grad_fn=vg_fn)
    np.testing.assert_allclose(fused, baseline, rtol=1e-4, atol=1e-5)
    # and the solve still reduces the error
    assert float(jnp.mean(plain(fused))) < float(jnp.mean(plain(guess)))


def test_first_quadrant_atan2_poly_matches_arctan2():
    from davo_tpu.camera.calibration_fast import first_quadrant_atan2_poly

    # dense first-quadrant grid incl. the axes and the reduction boundary
    r = jnp.concatenate(
        [
            jnp.linspace(0.0, 2.0, 201, dtype=jnp.float32),
            jnp.asarray([0.41421356, 0.41421357, 1e-20], dtype=jnp.float32),
        ]
    )
    y, x = jnp.meshgrid(r, r)
    approx = first_quadrant_atan2_poly(y, x)
    exact = jnp.arctan2(y, x)
    # (0, 0): exact atan2 returns 0 as well — include it
    np.testing.assert_allclose(approx, exact, atol=4e-7)
    # derivative parity away from the origin (f32 finite differences are
    # too coarse; compare autodiff of both formulations)
    ys = jnp.linspace(0.05, 1.95, 77, dtype=jnp.float32)
    xs = 2.0 - ys
    g_approx = jax.vmap(jax.grad(first_quadrant_atan2_poly, argnums=(0, 1)))(ys, xs)
    g_exact = jax.vmap(jax.grad(jnp.arctan2, argnums=(0, 1)))(ys, xs)
    np.testing.assert_allclose(g_approx[0], g_exact[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(g_approx[1], g_exact[1], rtol=1e-4, atol=1e-6)
