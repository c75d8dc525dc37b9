import jax.numpy as jnp
import numpy as np

from davo_tpu.geometry import rotate_vector_axis_angle, so3_rotation_matrix
from davo_tpu.train import (
    absolute_trajectory_error,
    camera_centers_from_poses,
    intrinsics_error,
    umeyama_alignment,
)


class TestUmeyama:
    def test_recovers_known_similarity(self, rng):
        src = jnp.asarray(rng.normal(size=(20, 3)))
        w = jnp.asarray([0.2, -0.4, 0.1])
        R_true = so3_rotation_matrix(w)
        s_true, t_true = 2.5, jnp.asarray([1.0, -2.0, 0.5])
        dst = s_true * src @ R_true.T + t_true
        R, t, s = umeyama_alignment(src, dst)
        np.testing.assert_allclose(R, R_true, atol=1e-8)
        np.testing.assert_allclose(t, t_true, atol=1e-7)
        np.testing.assert_allclose(s, s_true, rtol=1e-9)

    def test_without_scale(self, rng):
        src = jnp.asarray(rng.normal(size=(12, 3)))
        dst = src @ so3_rotation_matrix(jnp.asarray([0.0, 0.3, 0.0])).T + 1.0
        R, t, s = umeyama_alignment(src, dst, with_scale=False)
        np.testing.assert_allclose(s, 1.0)
        aligned = src @ R.T + t
        np.testing.assert_allclose(aligned, dst, atol=1e-8)

    def test_handles_reflection_degeneracy(self, rng):
        # aligning to a reflected copy must still return a proper rotation
        src = jnp.asarray(rng.normal(size=(10, 3)))
        dst = src.at[:, 0].multiply(-1.0)
        R, t, s = umeyama_alignment(src, dst)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, rtol=1e-8)


class TestATE:
    def test_zero_for_identical(self, rng):
        pos = jnp.asarray(rng.normal(size=(8, 3)))
        out = absolute_trajectory_error(pos, pos)
        np.testing.assert_allclose(out["rmse"], 0.0, atol=1e-10)

    def test_gauge_transformed_trajectory_has_zero_ate(self, rng):
        pos = jnp.asarray(rng.normal(size=(8, 3)))
        R = so3_rotation_matrix(jnp.asarray([0.1, 0.2, -0.3]))
        transformed = 3.0 * pos @ R.T + jnp.asarray([5.0, 0.0, -1.0])
        out = absolute_trajectory_error(transformed, pos, align=True)
        np.testing.assert_allclose(out["rmse"], 0.0, atol=1e-7)

    def test_unaligned_sees_the_offset(self, rng):
        pos = jnp.asarray(rng.normal(size=(8, 3)))
        shifted = pos + jnp.asarray([1.0, 0.0, 0.0])
        out = absolute_trajectory_error(shifted, pos, align=False)
        np.testing.assert_allclose(out["rmse"], 1.0, rtol=1e-7)
        out_aligned = absolute_trajectory_error(shifted, pos, align=True)
        np.testing.assert_allclose(out_aligned["rmse"], 0.0, atol=1e-8)

    def test_statistics_ordering(self, rng):
        est = jnp.asarray(rng.normal(size=(16, 3)))
        true = jnp.asarray(rng.normal(size=(16, 3)))
        out = absolute_trajectory_error(est, true)
        assert float(out["median"]) <= float(out["max"])
        assert float(out["mean"]) <= float(out["max"])


def test_camera_centers(rng):
    w = jnp.asarray(rng.normal(size=(5, 3)) * 0.3)
    centers_true = jnp.asarray(rng.normal(size=(5, 3)))
    # t = -R c
    R = so3_rotation_matrix(w)
    t = -jnp.einsum("mij,mj->mi", R, centers_true)
    centers = camera_centers_from_poses(w, t)
    np.testing.assert_allclose(centers, centers_true, atol=1e-9)


def test_intrinsics_error():
    est = jnp.asarray([[1.5, 0.1, -0.1]])
    true = jnp.asarray([[1.0, 0.0, 0.1]])
    out = intrinsics_error(est, true)
    np.testing.assert_allclose(out["f_error"], 0.5)
    np.testing.assert_allclose(out["cx_error"], 0.1)
    np.testing.assert_allclose(out["cy_error"], 0.2)
