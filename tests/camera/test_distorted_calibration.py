"""Distorted-model calibration pipeline (VERDICT r2 next #5): synthetic
scenes with known k1/k2/k3/p1/p2 + LM refinement recovering all 16
parameters (reference intent: camera_model/distorted_camera_model.py:137-140,
the Jacobian was "intended for Gauss-Newton" but never joined to a solver)."""

import jax
import jax.numpy as jnp
import pytest

from davo_tpu.camera import (
    DISTORTED_PARAM_NAMES,
    DistortedSceneConfig,
    distorted_project,
    evaluate_distorted_calibration,
    generate_distorted_scenes,
    refine_distorted,
)
from davo_tpu.solve.least_squares import LMConfig


def test_scene_generation_consistent(key):
    world, pixels, params = generate_distorted_scenes(
        key, 8, DistortedSceneConfig(dtype=jnp.float64)
    )
    assert world.shape == (8, 32, 3)
    assert pixels.shape == (8, 32, 2)
    assert params.shape == (8, 16)
    # pixels ARE the model's projections of the points
    assert jnp.allclose(pixels, distorted_project(world, params))
    # sensible magnitudes: most observations within a few image units
    assert float(jnp.median(jnp.abs(pixels))) < 2.0


def test_recovers_all_16_parameters_noiseless(key):
    """Noiseless recovery of every parameter to 1e-4 (the done-criterion)."""
    metrics = evaluate_distorted_calibration(
        key,
        batch=16,
        perturbation=0.02,
        scene=DistortedSceneConfig(dtype=jnp.float64),
    )
    assert metrics["start_max_param_error"] > 0.05  # the start is genuinely off
    assert metrics["max_param_error"] < 1e-4, metrics
    assert metrics["rms_residual"] < 1e-8, metrics


def test_recovery_f32(key):
    """f32 (the TPU dtype) still recovers to ~1e-3."""
    metrics = evaluate_distorted_calibration(
        key, batch=8, perturbation=0.01,
        scene=DistortedSceneConfig(dtype=jnp.float32),
    )
    assert metrics["max_param_error"] < 5e-3, metrics


def test_noise_robustness(key):
    """With pixel noise the residual floors at the noise level but the
    parameters stay near truth (over-determined 2N >> 16)."""
    metrics = evaluate_distorted_calibration(
        key, batch=8, perturbation=0.02, pixel_noise=1e-3,
        scene=DistortedSceneConfig(num_points=64, dtype=jnp.float64),
    )
    # the solve converges to the noise floor; the worst single parameter
    # (focal <-> depth trade-off) amplifies noise by conditioning, so the
    # hard bound is on the typical error and the residual level
    assert metrics["mean_param_error"] < 0.02, metrics
    assert metrics["max_param_error"] < 0.5, metrics
    assert 1e-4 < metrics["rms_residual"] < 5e-3


def test_refine_batched_shapes(key):
    world, pixels, params = generate_distorted_scenes(
        key, 4, DistortedSceneConfig(dtype=jnp.float64)
    )
    refined = refine_distorted(
        world, pixels, params + 0.01, LMConfig(iterations=10)
    )
    assert refined.shape == params.shape
    assert len(DISTORTED_PARAM_NAMES) == 16
