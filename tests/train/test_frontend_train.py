"""Front-end training harness: the fused step runs, learns, and the
image-based windowed VO path consumes its output end to end."""

import dataclasses
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.data import RenderConfig, VOWindowConfig
from davo_tpu.train.frontend import (
    FrontendExperiment,
    create_frontend_state,
    frontend_loss,
    make_frontend_train_step,
    render_scene_batch,
)


def _tiny_config(**kw):
    base = dict(
        num_views=3,
        num_points=4,
        num_select=4,
        image_size=32,
        descriptor_channels=8,
        embedding_size=8,
        batch_size=4,
        batches_per_epoch=2,
        val_batches=1,
        epochs=1,
        window=VOWindowConfig(num_views=3, num_points=4),
        render=RenderConfig(image_size=32),
    )
    base.update(kw)
    return FrontendExperiment(**base)


@pytest.mark.slow
def test_train_step_runs_and_reduces_loss(fixed_random_seed):
    config = _tiny_config()
    key = jax.random.key(fixed_random_seed)
    network, state = create_frontend_state(config, key)
    train_step, eval_step = make_frontend_train_step(network, config)
    k0 = jax.random.fold_in(key, 0)
    _, first = train_step(state, k0)
    for i in range(12):
        state, metrics = train_step(state, jax.random.fold_in(key, i))
    # evaluate on the SAME key to compare like for like
    _, final = train_step(state, k0)
    assert np.isfinite(float(final["loss"]))
    assert float(final["loss"]) < float(first["loss"])
    ev = eval_step(state, jax.random.fold_in(key, 999))
    assert 0.0 <= float(ev["match_inlier_rate"]) <= 1.0


def test_frontend_loss_masks_invisible_points(fixed_random_seed):
    from davo_tpu.data import generate_vo_window_batch

    config = _tiny_config()
    key = jax.random.key(fixed_random_seed)
    window = dataclasses.replace(
        config.window, num_views=config.num_views, num_points=config.num_points
    )
    batch = generate_vo_window_batch(key, 2, window)
    images = render_scene_batch(jax.random.fold_in(key, 1), batch, config.render)
    network, state = create_frontend_state(config, key)
    out = network.apply(
        {"params": state.params, "batch_stats": state.batch_stats}, images
    )
    loss_all, _ = frontend_loss(out, batch, config)
    # zero visibility => detection/match losses vanish, only score BCE left
    empty = batch._replace(
        visibility_mask=jnp.zeros_like(batch.visibility_mask)
    )
    loss_empty, metrics = frontend_loss(out, empty, config)
    assert np.isfinite(float(loss_all))
    np.testing.assert_allclose(float(metrics["detection_loss"]), 0.0)
    np.testing.assert_allclose(float(metrics["match_loss"]), 0.0)


@pytest.mark.slow
def test_image_based_windowed_vo_end_to_end(fixed_random_seed):
    """Images -> frontend -> guess -> stitching runs and returns finite
    poses (accuracy comes from training; this is the plumbing test)."""
    from davo_tpu.models import VOFrontend
    from davo_tpu.solve import BFGSConfig
    from davo_tpu.models.calibration_network import CalibrationNetwork
    from davo_tpu.train.vo_eval import (
        TrajectoryConfig,
        generate_trajectory,
        render_trajectory_images,
        solve_windowed_vo_learned,
    )

    key = jax.random.key(fixed_random_seed)
    tcfg = TrajectoryConfig(num_frames=5, num_points=4, window=3)
    poses, _, pixels, visibility = generate_trajectory(key, tcfg)
    render_cfg = RenderConfig(image_size=32)
    images = render_trajectory_images(
        pixels.astype(jnp.float32),
        visibility,
        jax.random.fold_in(key, 3),
        render_cfg,
    )
    assert images.shape == (5, 32, 32, 3)

    frontend = VOFrontend(num_select=4, descriptor_channels=8, embedding_size=8)
    fe_vars = frontend.init({"params": key}, images[None, :3])

    def frontend_fn(window_images):
        out = frontend.apply(fe_vars, window_images)
        return out.matches, out.match_visibility

    net = CalibrationNetwork(
        num_views=3,
        num_points=4,
        hidden_size=16,
        solver=BFGSConfig(iterations=2, line_search_iterations=4),
        fused_objective=False,
    )
    sample_m, sample_v = frontend_fn(images[None, :3])
    net_vars = net.init({"params": key}, sample_m, sample_v)

    def guess_fn(pw, vw):
        return net.apply(net_vars, pw.astype(jnp.float64), vw)

    estimates = solve_windowed_vo_learned(
        guess_fn,
        pixels,
        visibility,
        tcfg,
        images=images,
        frontend_fn=frontend_fn,
    )
    assert estimates.shape == (5, 6)
    assert np.all(np.isfinite(np.asarray(estimates)))
