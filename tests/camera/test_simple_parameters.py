import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    SimpleCameraModelParameters,
    NUM_SIMPLE_CAMERA_PARAMS,
)


def test_make_roundtrip(rng):
    vec = jnp.asarray(rng.normal(size=(4, NUM_SIMPLE_CAMERA_PARAMS)))
    params = SimpleCameraModelParameters.make(vec)
    np.testing.assert_array_equal(params.as_vector(), vec)
    assert params.a.shape == (4, 3)


def test_make_wrong_size_raises():
    with pytest.raises(ValueError):
        SimpleCameraModelParameters.make(jnp.zeros(7))


def test_stack(rng):
    items = [
        SimpleCameraModelParameters.make(
            jnp.asarray(rng.normal(size=NUM_SIMPLE_CAMERA_PARAMS))
        )
        for _ in range(3)
    ]
    stacked = SimpleCameraModelParameters.stack(items)
    assert stacked.cx.shape == (3,)
    np.testing.assert_array_equal(stacked.as_vector()[1], items[1].as_vector())


def test_rotation_matrix_orthonormal(rng):
    params = SimpleCameraModelParameters.make(
        jnp.asarray(rng.normal(size=(5, NUM_SIMPLE_CAMERA_PARAMS)))
    )
    R = params.rotation_matrix()
    np.testing.assert_allclose(
        jnp.einsum("...ji,...jk->...ik", R, R),
        np.broadcast_to(np.eye(3), (5, 3, 3)),
        atol=1e-9,
    )


def test_identity_camera_projects_pinhole(rng):
    vec = jnp.zeros(NUM_SIMPLE_CAMERA_PARAMS)
    vec = vec.at[2].set(2.0)  # f
    vec = vec.at[3].set(1.0)  # a = +x (forward-> identity with b = +y)
    vec = vec.at[7].set(1.0)  # b = +y
    vec = vec.at[11].set(5.0)  # tz
    params = SimpleCameraModelParameters.make(vec)
    R = params.rotation_matrix()
    np.testing.assert_allclose(R, np.eye(3), atol=1e-10)
    points = jnp.asarray([[1.0, -1.0, 0.0]])
    uv = params.project(points)
    np.testing.assert_allclose(uv[0], [2.0 / 5.0, -2.0 / 5.0], atol=1e-8)
