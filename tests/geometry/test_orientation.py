import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.geometry import (
    two_vector_rotation_matrix,
    two_vector_rotation_jacobian,
)


class TestTwoVectorRotation:
    def test_orthonormal_output(self, rng):
        a = jnp.asarray(rng.normal(size=(8, 3)))
        b = jnp.asarray(rng.normal(size=(8, 3)))
        R = two_vector_rotation_matrix(a, b)
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-9
        )
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, rtol=1e-9)

    def test_first_column_is_normalised_a(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 3)))
        b = jnp.asarray(rng.normal(size=(4, 3)))
        R = two_vector_rotation_matrix(a, b)
        a_hat = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        np.testing.assert_allclose(R[..., 0], a_hat, rtol=1e-9)

    def test_second_column_in_ab_plane_orthogonal_to_a(self, rng):
        a = jnp.asarray(rng.normal(size=(4, 3)))
        b = jnp.asarray(rng.normal(size=(4, 3)))
        R = two_vector_rotation_matrix(a, b)
        col2 = R[..., 1]
        np.testing.assert_allclose(
            jnp.sum(col2 * a, axis=-1), np.zeros(4), atol=1e-9
        )
        # col2 lies in span(a, b): triple product with a and b is 0.
        cross_ab = np.cross(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.sum(np.asarray(col2) * cross_ab, axis=-1), np.zeros(4), atol=1e-8
        )

    def test_axis_aligned_case(self):
        R = two_vector_rotation_matrix(
            jnp.asarray([2.0, 0.0, 0.0]), jnp.asarray([1.0, 3.0, 0.0])
        )
        np.testing.assert_allclose(R, np.eye(3), atol=1e-12)

    def test_jacobian_matches_autodiff_structure(self, rng):
        a = jnp.asarray(rng.normal(size=(3,)))
        b = jnp.asarray(rng.normal(size=(3,)))
        dR_da, dR_db = two_vector_rotation_jacobian(a, b)
        assert dR_da.shape == (3, 3, 3) and dR_db.shape == (3, 3, 3)
        # finite-difference spot check
        eps = 1e-6
        for k in range(3):
            da = np.zeros(3)
            da[k] = eps
            fd = (
                np.asarray(two_vector_rotation_matrix(a + da, b))
                - np.asarray(two_vector_rotation_matrix(a - da, b))
            ) / (2 * eps)
            np.testing.assert_allclose(dR_da[..., k], fd, atol=1e-6)

    def test_jacobian_batched(self, rng):
        a = jnp.asarray(rng.normal(size=(2, 4, 3)))
        b = jnp.asarray(rng.normal(size=(2, 4, 3)))
        dR_da, dR_db = two_vector_rotation_jacobian(a, b)
        assert dR_da.shape == (2, 4, 3, 3, 3)
        assert dR_db.shape == (2, 4, 3, 3, 3)
