import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from davo_tpu.geometry import (
    rotate_vector_axis_angle,
    so3_rotation_matrix,
    so3_parameter_jacobian,
    so3_vector_jacobian,
    axis_angle_from_quaternion,
    wrap_axis_angle,
    skew_matrix,
)


def _reference_rotation_matrix(w):
    """Rodrigues via scipy-free numpy, for arbitrary single vectors."""
    w = np.asarray(w, dtype=np.float64)
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    axis = w / theta
    K = np.array(
        [
            [0.0, -axis[2], axis[1]],
            [axis[2], 0.0, -axis[0]],
            [-axis[1], axis[0], 0.0],
        ]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


class TestRotateVector:
    def test_identity_rotation(self, rng):
        v = jnp.asarray(rng.normal(size=(5, 3)))
        out = rotate_vector_axis_angle(v, jnp.zeros((5, 3)))
        np.testing.assert_allclose(out, v, atol=1e-12)

    def test_matches_rotation_matrix(self, rng):
        for _ in range(10):
            w = rng.normal(size=3)
            v = rng.normal(size=3)
            expected = _reference_rotation_matrix(w) @ v
            out = rotate_vector_axis_angle(jnp.asarray(v), jnp.asarray(w))
            np.testing.assert_allclose(out, expected, rtol=1e-10, atol=1e-12)

    def test_quarter_turn_about_z(self):
        w = jnp.asarray([0.0, 0.0, np.pi / 2])
        v = jnp.asarray([1.0, 0.0, 0.0])
        out = rotate_vector_axis_angle(v, w)
        np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-12)

    def test_rotation_preserves_norm(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)))
        v = jnp.asarray(rng.normal(size=(16, 3)))
        out = rotate_vector_axis_angle(v, w)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-10
        )

    def test_parallel_vector_unchanged(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 3)))
        out = rotate_vector_axis_angle(2.0 * w, w)
        np.testing.assert_allclose(out, 2.0 * w, rtol=1e-9, atol=1e-10)

    def test_broadcasting(self, rng):
        w = jnp.asarray(rng.normal(size=(4, 1, 3)))
        v = jnp.asarray(rng.normal(size=(1, 7, 3)))
        out = rotate_vector_axis_angle(v, w)
        assert out.shape == (4, 7, 3)

    def test_gradients(self, rng):
        w = jnp.asarray(rng.normal(size=(4, 3)))
        v = jnp.asarray(rng.normal(size=(4, 3)))
        check_grads(rotate_vector_axis_angle, (v, w), order=2, atol=1e-5, rtol=1e-5)

    def test_gradients_finite_at_identity(self, rng):
        v = jnp.asarray(rng.normal(size=(4, 3)))
        g = jax.grad(lambda w: rotate_vector_axis_angle(v, w).sum())(jnp.zeros((4, 3)))
        assert np.all(np.isfinite(g))
        h = jax.hessian(
            lambda w: rotate_vector_axis_angle(v[0], w).sum()
        )(jnp.zeros(3))
        assert np.all(np.isfinite(h))

    def test_gradients_small_angle(self, rng):
        w = jnp.asarray(rng.normal(size=(4, 3)) * 1e-3)
        v = jnp.asarray(rng.normal(size=(4, 3)))
        check_grads(rotate_vector_axis_angle, (v, w), order=2, atol=1e-5, rtol=1e-5)


class TestRotationMatrix:
    def test_matches_reference(self, rng):
        for _ in range(10):
            w = rng.normal(size=3)
            out = so3_rotation_matrix(jnp.asarray(w))
            np.testing.assert_allclose(
                out, _reference_rotation_matrix(w), rtol=1e-10, atol=1e-12
            )

    def test_orthonormal(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 3)))
        R = so3_rotation_matrix(w)
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-10
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, rtol=1e-10)

    def test_matrix_rotation_agrees_with_formula(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 3)))
        v = jnp.asarray(rng.normal(size=(8, 3)))
        via_matrix = jnp.einsum("...ij,...j->...i", so3_rotation_matrix(w), v)
        np.testing.assert_allclose(
            via_matrix, rotate_vector_axis_angle(v, w), rtol=1e-9, atol=1e-10
        )


class TestParameterJacobian:
    def test_matches_autodiff(self, rng):
        w = jnp.asarray(rng.normal(size=(6, 3)))
        v = jnp.asarray(rng.normal(size=(6, 3)))
        analytic = so3_parameter_jacobian(v, w)
        autodiff = jax.vmap(
            lambda vv, ww: jax.jacfwd(lambda x: rotate_vector_axis_angle(vv, x))(ww)
        )(v, w)
        np.testing.assert_allclose(analytic, autodiff, rtol=1e-8, atol=1e-10)

    def test_matches_autodiff_small_angles(self, rng):
        w = jnp.asarray(rng.normal(size=(6, 3)) * 1e-3)
        v = jnp.asarray(rng.normal(size=(6, 3)))
        analytic = so3_parameter_jacobian(v, w)
        autodiff = jax.vmap(
            lambda vv, ww: jax.jacfwd(lambda x: rotate_vector_axis_angle(vv, x))(ww)
        )(v, w)
        np.testing.assert_allclose(analytic, autodiff, rtol=1e-8, atol=1e-10)

    def test_identity_jacobian_is_negative_skew(self, rng):
        # At w = 0: d(Rv)/dw = -[v]_x  (since R v ~ v + w x v).
        v = jnp.asarray(rng.normal(size=(3,)))
        analytic = so3_parameter_jacobian(v, jnp.zeros(3))
        np.testing.assert_allclose(analytic, -np.asarray(skew_matrix(v)), atol=1e-12)

    def test_zero_for_parallel_axis_rotation_shift(self, rng):
        # Moving along the axis direction with v parallel to the axis
        # changes nothing: J @ w == 0 when v is parallel to w.
        w = jnp.asarray(rng.normal(size=(3,)))
        analytic = so3_parameter_jacobian(1.7 * w, w)
        np.testing.assert_allclose(analytic @ w, np.zeros(3), atol=1e-9)


class TestVectorJacobian:
    def test_is_rotation_matrix(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)))
        np.testing.assert_allclose(
            so3_vector_jacobian(w), so3_rotation_matrix(w), atol=0
        )

    def test_matches_autodiff(self, rng):
        w = jnp.asarray(rng.normal(size=3))
        v = jnp.asarray(rng.normal(size=3))
        autodiff = jax.jacfwd(lambda x: rotate_vector_axis_angle(x, w))(v)
        np.testing.assert_allclose(
            so3_vector_jacobian(w), autodiff, rtol=1e-9, atol=1e-11
        )


class TestQuaternion:
    def test_simple_quaternion(self):
        # 90 degrees about z.
        q = jnp.asarray([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
        w = axis_angle_from_quaternion(q)
        np.testing.assert_allclose(w, [0.0, 0.0, np.pi / 2], atol=1e-10)

    def test_identity_quaternion(self):
        w = axis_angle_from_quaternion(jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(w, np.zeros(3), atol=1e-12)

    def test_rotation_agrees_with_quaternion_rotation(self, rng):
        for _ in range(5):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            v = rng.normal(size=3)
            # quaternion rotation: v' = q v q*
            s, x, y, z = q
            R = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - s * z), 2 * (x * z + s * y)],
                    [2 * (x * y + s * z), 1 - 2 * (x * x + z * z), 2 * (y * z - s * x)],
                    [2 * (x * z - s * y), 2 * (y * z + s * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            w = axis_angle_from_quaternion(jnp.asarray(q))
            out = rotate_vector_axis_angle(jnp.asarray(v), w)
            np.testing.assert_allclose(out, R @ v, rtol=1e-8, atol=1e-10)


class TestWrapAxisAngle:
    def test_small_angle_unchanged(self, rng):
        w = jnp.asarray(rng.normal(size=(5, 3)) * 0.3)
        np.testing.assert_allclose(wrap_axis_angle(w), w, rtol=1e-7, atol=1e-9)

    def test_large_angle_wraps(self):
        w = jnp.asarray([0.0, 0.0, 2.0 * np.pi + 0.25])
        np.testing.assert_allclose(
            wrap_axis_angle(w), [0.0, 0.0, 0.25], atol=1e-10
        )

    def test_wrapped_rotation_equivalent(self, rng):
        w = jnp.asarray(rng.normal(size=(4, 3)) * 4.0)
        v = jnp.asarray(rng.normal(size=(4, 3)))
        np.testing.assert_allclose(
            rotate_vector_axis_angle(v, wrap_axis_angle(w)),
            rotate_vector_axis_angle(v, w),
            rtol=1e-7,
            atol=1e-9,
        )


def test_jit_and_vmap_compose(rng):
    w = jnp.asarray(rng.normal(size=(2, 5, 3)))
    v = jnp.asarray(rng.normal(size=(2, 5, 3)))
    out = jax.jit(jax.vmap(jax.vmap(rotate_vector_axis_angle)))(v, w)
    np.testing.assert_allclose(out, rotate_vector_axis_angle(v, w), rtol=1e-12)
