"""calibration_error_fast must match calibration_error in value and grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import calibration_error, num_calibration_parameters
from davo_tpu.camera.calibration_fast import calibration_error_fast


def _random_problem(seed, b=16, m=4, n=8, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    p = num_calibration_parameters(m, n)
    params = jnp.asarray(rng.normal(size=(b, p)) * 0.5, dtype)
    params = params.at[:, 0].add(1.0)
    params = params.at[:, 5 : 3 + 3 * n : 3].add(5.0)  # points in front
    pixels = jnp.asarray(rng.normal(size=(b, m, n, 2)) * 0.5, dtype)
    vis = jnp.asarray(rng.random((b, m, n)) > 0.2)
    return params, pixels, vis


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_values_match(seed):
    params, pixels, vis = _random_problem(seed)
    ref = calibration_error(params, pixels, vis)
    fast = calibration_error_fast(params, pixels, vis)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 3])
def test_gradients_match(seed):
    params, pixels, vis = _random_problem(seed)

    def total_ref(p):
        return jnp.sum(calibration_error(p, pixels, vis))

    def total_fast(p):
        return jnp.sum(calibration_error_fast(p, pixels, vis))

    g_ref = jax.grad(total_ref)(params)
    g_fast = jax.grad(total_fast)(params)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=1e-9, atol=1e-12
    )


def test_jvp_matches():
    params, pixels, vis = _random_problem(5)
    tangent = jnp.ones_like(params)
    _, jv_ref = jax.jvp(
        lambda p: calibration_error(p, pixels, vis), (params,), (tangent,)
    )
    _, jv_fast = jax.jvp(
        lambda p: calibration_error_fast(p, pixels, vis), (params,), (tangent,)
    )
    np.testing.assert_allclose(
        np.asarray(jv_fast), np.asarray(jv_ref), rtol=1e-9, atol=1e-12
    )


def test_degenerate_zero_scene_no_nan():
    b, m, n = 4, 3, 5
    p = num_calibration_parameters(m, n)
    params = jnp.zeros((b, p))
    pixels = jnp.zeros((b, m, n, 2))
    vis = jnp.ones((b, m, n), bool)
    ref = calibration_error(params, pixels, vis)
    fast = calibration_error_fast(params, pixels, vis)
    assert np.all(np.isfinite(np.asarray(fast)))
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-12)
    # gradients at the exactly-zero point coordinates are NaN in BOTH
    # implementations (a (0:0:0) homogeneous coordinate has no ray
    # direction); assert the fast path reproduces the reference pattern.
    g_ref = jax.grad(lambda q: jnp.sum(calibration_error(q, pixels, vis)))(
        params
    )
    g_fast = jax.grad(
        lambda q: jnp.sum(calibration_error_fast(q, pixels, vis))
    )(params)
    np.testing.assert_array_equal(
        np.isfinite(np.asarray(g_fast)), np.isfinite(np.asarray(g_ref))
    )


def test_perfect_observations_zero_error_and_grad_finite():
    # rays exactly aligned with the identity view's world points
    b, m, n = 2, 2, 4
    p = num_calibration_parameters(m, n)
    rng = np.random.default_rng(7)
    params = jnp.asarray(rng.normal(size=(b, p)) * 0.3)
    params = params.at[:, 5 : 3 + 3 * n : 3].set(8.0)
    # build pixels for view 0 that exactly match: u = x/z * f' + cx
    from davo_tpu.camera import unpack_calibration_parameters

    parts = unpack_calibration_parameters(params, m, n)
    w = parts.world_points[:, 0]  # (B, N, 3) before rescale
    # the gauge rescale divides points and translations by one scale; rays
    # are scale-invariant, so pixels from unscaled points still align.
    focal = jax.nn.elu(params[:, 0:1]) + 1.0
    u = w[..., 0] / w[..., 2] * focal + params[:, 1:2]
    v = w[..., 1] / w[..., 2] * focal + params[:, 2:3]
    pixels = jnp.stack(
        [
            jnp.stack([u, v], axis=-1),
            jnp.zeros((b, n, 2)),
        ],
        axis=1,
    )
    vis = jnp.stack(
        [jnp.ones((b, n), bool), jnp.zeros((b, n), bool)], axis=1
    )
    err = calibration_error_fast(params, pixels, vis)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-7)
    g = jax.grad(lambda q: jnp.sum(calibration_error_fast(q, pixels, vis)))(
        params
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_gradient_matches_at_focal_boundary():
    # regression: where(f>0, f+1, exp(minimum(f, 0))) split the tangent
    # 50/50 at exactly f == 0 (gradient 0.5 instead of elu'(0) == 1);
    # the double-where form must match the reference elu(f)+1 gradient.
    params, pixels, vis = _random_problem(11, b=6)
    params = params.at[:, 0].set(0.0)  # focal parameter exactly at the tie
    g_ref = jax.grad(lambda p: jnp.sum(calibration_error(p, pixels, vis)))(
        params
    )
    g_fast = jax.grad(
        lambda p: jnp.sum(calibration_error_fast(p, pixels, vis))
    )(params)
    np.testing.assert_allclose(
        np.asarray(g_fast[:, 0]), np.asarray(g_ref[:, 0]), rtol=1e-9
    )


def test_rejects_extra_batch_dims():
    params, pixels, vis = _random_problem(0, b=4)
    with pytest.raises(ValueError):
        calibration_error_fast(params[None], pixels[None], vis[None])
