"""Fused BFGS update+direction kernel vs the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.ops import fused_bfgs_update_direction, reference_update_direction
from davo_tpu.solve import BFGSConfig, bfgs_solve


def _random_case(seed, b=256, p=7, negative_curvature_frac=0.25):
    rng = np.random.default_rng(seed)
    # symmetric positive-ish H per element
    a = rng.normal(size=(b, p, p))
    h = (a @ np.swapaxes(a, 1, 2) / p + np.eye(p)).astype(np.float32)
    s = rng.normal(size=(b, p)).astype(np.float32) * 0.1
    y = rng.normal(size=(b, p)).astype(np.float32) * 0.1
    # force a slice of elements to non-positive curvature (update skipped)
    k = int(b * negative_curvature_frac)
    y[:k] = -s[:k] * np.abs(rng.normal(size=(k, p)).astype(np.float32))
    g = rng.normal(size=(b, p)).astype(np.float32)
    upd = rng.random(b) > 0.3
    return (
        jnp.asarray(h),
        jnp.asarray(s),
        jnp.asarray(y),
        jnp.asarray(g),
        jnp.asarray(upd),
    )


@pytest.mark.parametrize(
    "first,second", [(False, False), (True, False), (False, True)]
)
def test_kernel_matches_reference(first, second):
    h, s, y, g, upd = _random_case(0)
    h_ref, d_ref = reference_update_direction(
        h, s, y, g, upd, jnp.asarray(first), jnp.asarray(second)
    )
    h_t = jnp.transpose(h, (1, 2, 0))
    h_out_t, d = fused_bfgs_update_direction(
        h_t,
        s,
        y,
        g,
        upd,
        jnp.asarray(first),
        jnp.asarray(second),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(h_out_t), (2, 0, 1)),
        np.asarray(h_ref),
        rtol=2e-5,
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(d_ref), rtol=2e-5, atol=2e-5
    )


def test_negative_curvature_skips_update():
    h, s, y, g, upd = _random_case(1)
    # all-negative curvature: H must come back unchanged (up to rescale=off)
    y = -s
    h_t = jnp.transpose(h, (1, 2, 0))
    h_out_t, d = fused_bfgs_update_direction(
        h_t, s, y, g, upd, jnp.asarray(False), jnp.asarray(False), interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(h_out_t), np.asarray(h_t), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(d),
        -np.einsum("bij,bj->bi", np.asarray(h), np.asarray(g)),
        rtol=2e-5,
        atol=2e-5,
    )


def test_bf16_carry_matches_f32_coarsely():
    """bfloat16 H storage: update math stays f32, so the result matches
    the f32 carry to bf16 resolution (~3 significant digits)."""
    h, s, y, g, upd = _random_case(6)
    h_t = jnp.transpose(h, (1, 2, 0))
    args = (s, y, g, upd, jnp.asarray(False), jnp.asarray(False))
    h32, d32 = fused_bfgs_update_direction(h_t, *args, interpret=True)
    h16, d16 = fused_bfgs_update_direction(
        h_t.astype(jnp.bfloat16), *args, interpret=True
    )
    assert h16.dtype == jnp.bfloat16
    assert d16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(h16, np.float32), np.asarray(h32), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(d16), np.asarray(d32), rtol=5e-2, atol=5e-2
    )


def test_bf16_carry_solver_converges():
    rng = np.random.default_rng(9)
    b, p = 128, 5
    target = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32))
    start = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32)) * 3.0

    def err_fn(params):
        return jnp.sum(jnp.square(params - target), axis=-1)

    out = bfgs_solve(
        err_fn,
        start,
        BFGSConfig(
            fused_hessian_kernel=True,
            hessian_dtype="bfloat16",
            error_threshold=1e-10,
            iterations=15,
            minimum_step=0.0,
            drop_path_p=0.0,
            line_search_iterations=12,
        ),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(target), rtol=1e-3, atol=1e-3
    )


def test_platform_dependent_fallback_on_cpu():
    """interpret=None defers to lowering: on CPU the jnp fallback path
    must produce the same result as the explicit interpreter kernel."""
    h, s, y, g, upd = _random_case(4)
    h_t = jnp.transpose(h, (1, 2, 0))
    args = (s, y, g, upd, jnp.asarray(False), jnp.asarray(True))
    h_auto, d_auto = jax.jit(
        lambda ht: fused_bfgs_update_direction(ht, *args)
    )(h_t)
    h_interp, d_interp = fused_bfgs_update_direction(h_t, *args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(h_auto), np.asarray(h_interp), rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_auto), np.asarray(d_interp), rtol=2e-5, atol=2e-5
    )


def test_bad_shapes_raise():
    h, s, y, g, upd = _random_case(2, b=100)
    h_t = jnp.transpose(h, (1, 2, 0))
    # a non-dividing block falls back to the largest dividing halving
    # (100 % 64 != 0 -> block 4) instead of raising
    h_out, d = fused_bfgs_update_direction(
        h_t, s, y, g, upd, jnp.asarray(False), jnp.asarray(False),
        block_b=64,
        interpret=True,
    )
    assert h_out.shape == h_t.shape
    with pytest.raises(ValueError):
        fused_bfgs_update_direction(
            jnp.transpose(h, (2, 1, 0))[:3],
            s, y, g, upd, jnp.asarray(False), jnp.asarray(False),
            interpret=True,
        )


def test_solver_parity_on_quadratic():
    """bfgs_solve with the fused kernel matches the jnp path end to end."""
    rng = np.random.default_rng(3)
    b, p = 128, 5
    target = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32))
    start = jnp.asarray(rng.normal(size=(b, p)).astype(np.float32)) * 3.0

    def err_fn(params):
        return jnp.sum(jnp.square(params - target), axis=-1)

    cfg = dict(
        error_threshold=1e-10,
        iterations=12,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=12,
    )
    ref = bfgs_solve(
        err_fn, start, BFGSConfig(fused_hessian_kernel=False, **cfg)
    )
    fused = bfgs_solve(
        err_fn, start, BFGSConfig(fused_hessian_kernel=True, **cfg)
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(target), rtol=1e-3, atol=1e-3
    )


def test_fused_config_rejects_unfusable():
    start = jnp.zeros((100, 4), jnp.float32)  # 100 % 128 != 0

    def err_fn(params):
        return jnp.sum(jnp.square(params), axis=-1)

    with pytest.raises(ValueError):
        bfgs_solve(
            err_fn, start, BFGSConfig(fused_hessian_kernel=True, drop_path_p=0.0)
        )
