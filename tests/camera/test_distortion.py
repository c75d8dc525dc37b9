import jax
import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.camera import (
    NUM_DISTORTED_PARAMS,
    distorted_project,
    distorted_project_and_jacobian,
)
from davo_tpu.camera.distortion import CX, CY, FX, FY, K1, P1, RX, RY, RZ, TZ
from davo_tpu.solve import LMConfig, levenberg_marquardt


def _identity_params(fx=1.0, fy=1.0, tz=5.0):
    p = np.zeros(NUM_DISTORTED_PARAMS)
    p[FX] = fx
    p[FY] = fy
    p[TZ] = tz
    return p


class TestForwardModel:
    def test_undistorted_pinhole(self):
        params = jnp.asarray(_identity_params(fx=2.0, fy=3.0, tz=4.0))
        points = jnp.asarray([[1.0, -1.0, 0.0]])
        uv = distorted_project(points, params)
        np.testing.assert_allclose(uv[0], [2.0 * 0.25, 3.0 * -0.25], atol=1e-8)

    def test_principal_point_offsets(self):
        p = _identity_params()
        p[CX], p[CY] = 0.25, -0.5
        uv = distorted_project(jnp.zeros((1, 3)), jnp.asarray(p))
        np.testing.assert_allclose(uv[0], [0.25, -0.5], atol=1e-10)

    def test_radial_distortion_pushes_outward(self):
        p = _identity_params()
        p[K1] = 0.1
        uv = distorted_project(jnp.asarray([[1.0, 0.0, 0.0]]), jnp.asarray(p))
        # undistorted u = 0.2; r2 = 0.04; u' = 0.2 * (1 + 0.1*0.04)
        np.testing.assert_allclose(uv[0, 0], 0.2 * (1 + 0.1 * 0.04), rtol=1e-8)

    def test_tangential_distortion(self):
        p = _identity_params()
        p[P1] = 0.05
        uv = distorted_project(jnp.asarray([[1.0, 1.0, 0.0]]), jnp.asarray(p))
        u = v = 0.2
        r2 = u * u + v * v
        np.testing.assert_allclose(uv[0, 0], u + 2 * 0.05 * u * v, rtol=1e-8)
        np.testing.assert_allclose(uv[0, 1], v + 0.05 * (r2 + 2 * v * v), rtol=1e-8)

    def test_rotation_about_z(self):
        p = _identity_params()
        p[RZ] = np.pi / 2
        uv = distorted_project(jnp.asarray([[1.0, 0.0, 0.0]]), jnp.asarray(p))
        # Rz(90deg) maps (1,0,0) -> (0,1,0); z = 5
        np.testing.assert_allclose(uv[0], [0.0, 0.2], atol=1e-8)

    def test_batched(self, rng):
        params = jnp.asarray(
            rng.normal(size=(4, NUM_DISTORTED_PARAMS)) * 0.1
        ).at[:, FX].add(1.0).at[:, FY].add(1.0).at[:, TZ].add(5.0)
        points = jnp.asarray(rng.normal(size=(4, 7, 3)))
        uv = distorted_project(points, params)
        assert uv.shape == (4, 7, 2)
        assert np.all(np.isfinite(uv))


class TestJacobian:
    def test_matches_finite_differences(self, rng):
        params = jnp.asarray(
            _identity_params(fx=1.2, fy=0.9, tz=6.0)
            + 0.05 * rng.normal(size=NUM_DISTORTED_PARAMS)
        )
        points = jnp.asarray(rng.normal(size=(5, 3)))
        uv, jac = distorted_project_and_jacobian(points, params)
        assert jac.shape == (5, 2, NUM_DISTORTED_PARAMS)
        eps = 1e-6
        for k in range(NUM_DISTORTED_PARAMS):
            dp = np.zeros(NUM_DISTORTED_PARAMS)
            dp[k] = eps
            fd = (
                np.asarray(distorted_project(points, params + dp))
                - np.asarray(distorted_project(points, params - dp))
            ) / (2 * eps)
            np.testing.assert_allclose(
                jac[..., k], fd, atol=1e-5, err_msg=f"param {k}"
            )

    def test_batched_jacobian_shape(self, rng):
        params = jnp.asarray(rng.normal(size=(3, NUM_DISTORTED_PARAMS)) * 0.1)
        params = params.at[:, TZ].add(5.0).at[:, FX].add(1.0).at[:, FY].add(1.0)
        points = jnp.asarray(rng.normal(size=(3, 6, 3)))
        uv, jac = distorted_project_and_jacobian(points, params)
        assert jac.shape == (3, 6, 2, NUM_DISTORTED_PARAMS)

    def test_closed_form_equals_jacfwd(self, rng):
        """The hand-assembled Jacobian must equal the autodiff build to
        roundoff — batched and unbatched, with every distortion term
        live (reference closed form:
        camera_model/distorted_camera_model.py:114-385)."""
        from davo_tpu.camera.distortion import (
            distorted_project_and_jacobian_jacfwd,
        )

        params = jnp.asarray(rng.normal(size=(4, NUM_DISTORTED_PARAMS)) * 0.3)
        params = params.at[:, TZ].add(6.0).at[:, FX].add(1.2).at[:, FY].add(1.1)
        points = jnp.asarray(rng.normal(size=(4, 9, 3)))
        uv_c, jac_c = distorted_project_and_jacobian(points, params)
        uv_a, jac_a = distorted_project_and_jacobian_jacfwd(points, params)
        np.testing.assert_allclose(uv_c, uv_a, rtol=0, atol=1e-12)
        np.testing.assert_allclose(jac_c, jac_a, rtol=0, atol=1e-11)
        uv_c, jac_c = distorted_project_and_jacobian(points[0], params[0])
        uv_a, jac_a = distorted_project_and_jacobian_jacfwd(points[0], params[0])
        np.testing.assert_allclose(jac_c, jac_a, rtol=0, atol=1e-11)


class TestLMRefinement:
    def test_recovers_perturbed_parameters(self, rng):
        true_params = jnp.asarray(_identity_params(fx=1.5, fy=1.4, tz=8.0))
        points = jnp.asarray(rng.normal(size=(24, 3)) * 2.0)
        observed = distorted_project(points, true_params)

        def res_and_jac(p):
            uv, jac = distorted_project_and_jacobian(points, p)
            res = (uv - observed).reshape(-1)
            return res, jac.reshape(-1, NUM_DISTORTED_PARAMS)

        start = true_params + 0.01 * jnp.asarray(
            rng.normal(size=NUM_DISTORTED_PARAMS)
        )
        out = levenberg_marquardt(res_and_jac, start, LMConfig(iterations=30))
        final_res, _ = res_and_jac(out)
        assert float(jnp.sum(jnp.square(final_res))) < 1e-8
