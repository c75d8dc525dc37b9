"""eval-seq image loop (VERDICT r2 next #4): learned windowed VO along a
TUM/KITTI trajectory file, end-to-end from rendered pixels."""

import os

import jax
import numpy as np
import pytest

from davo_tpu.data.rendering import RenderConfig
from davo_tpu.models import CalibrationNetwork, VOFrontend
from davo_tpu.solve import BFGSConfig
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    evaluate_vo_sequence_file,
)

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")


def _tiny_guess(key, window, points):
    net = CalibrationNetwork(
        num_views=window,
        num_points=points,
        hidden_size=16,
        solver=BFGSConfig(
            error_threshold=1e-7,
            iterations=3,
            drop_path_p=0.0,
            line_search_iterations=8,
        ),
    )
    pix = jax.random.normal(key, (1, window, points, 2))
    vis = jax.numpy.ones((1, window, points))
    variables = net.init({"params": key}, pix, vis)
    return lambda pw, vw: net.apply(variables, pw, vw)


@pytest.mark.slow
def test_learned_guess_on_sequence_file(key):
    """guess_fn alone: learned guess+solve on synthesized observations
    along the file trajectory."""
    metrics = evaluate_vo_sequence_file(
        os.path.join(FIXTURES, "kitti_mini_00.txt"),
        format="kitti",
        config=TrajectoryConfig(window=3),
        key=key,
        num_points=6,
        guess_fn=_tiny_guess(key, 3, 6),
    )
    assert np.isfinite(float(metrics["rmse"]))
    assert np.isfinite(float(metrics["rpe_trans_rmse"]))


@pytest.mark.slow
def test_learned_frontend_on_sequence_file(key):
    """Full image loop: file trajectory -> rendered frames -> detector +
    matcher -> windowed learned solve -> ATE/RPE (no oracle observations
    reach the solver)."""
    render = RenderConfig(image_size=32)
    fe = VOFrontend(num_select=6, descriptor_channels=16, embedding_size=16)
    images = jax.random.uniform(key, (1, 3, 32, 32, 3))
    fe_vars = fe.init({"params": key}, images)

    def frontend_fn(imgs):
        out = fe.apply(fe_vars, imgs)
        return out.matches, out.match_visibility

    metrics = evaluate_vo_sequence_file(
        os.path.join(FIXTURES, "kitti_mini_00.txt"),
        format="kitti",
        config=TrajectoryConfig(window=3),
        key=key,
        num_points=6,
        guess_fn=_tiny_guess(key, 3, 6),
        frontend_fn=frontend_fn,
        render_config=render,
        stitch="robust",
    )
    assert np.isfinite(float(metrics["rmse"]))


@pytest.mark.slow
def test_incremental_pipeline_on_sequence_file(key):
    """eval-seq with the incremental (PnP + BA) pipeline end-to-end from
    rendered pixels along the KITTI fixture."""
    render = RenderConfig(image_size=32)
    fe = VOFrontend(num_select=6, descriptor_channels=16, embedding_size=16)
    images = jax.random.uniform(key, (1, 3, 32, 32, 3))
    fe_vars = fe.init({"params": key}, images)

    def frontend_fn(imgs):
        out = fe.apply(fe_vars, imgs)
        return out.matches, out.match_visibility

    def detections_fn(imgs):
        out = fe.apply(fe_vars, imgs)
        return out.points, jax.nn.sigmoid(out.scores)

    metrics = evaluate_vo_sequence_file(
        os.path.join(FIXTURES, "kitti_mini_00.txt"),
        format="kitti",
        config=TrajectoryConfig(window=3),
        key=key,
        num_points=6,
        guess_fn=_tiny_guess(key, 3, 6),
        frontend_fn=frontend_fn,
        render_config=render,
        pipeline="incremental",
        detections_fn=detections_fn,
    )
    assert np.isfinite(float(metrics["rmse"]))
