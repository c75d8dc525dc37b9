"""Training harness for the visual front-end (detector + attention matcher).

The reference never trains its image modules (the detector is broken, the
matcher is composed only abstractly — SURVEY.md §2.9); this harness
realises the design intent end-to-end: VO-window scenes are generated
on-device (``data/vo_windows.py``), rendered into images
(``data/rendering.py``), and the :class:`davo_tpu.models.VOFrontend` is
trained supervised against the known ground-truth correspondences.

Losses (all static-shape, masked by visibility):

* **detection** — for every visible true point, the distance to the
  *nearest* detected feature in that view (pulls one feature onto every
  rendered blob; the bounded cell-offset parametrisation guarantees a
  nearby candidate exists);
* **score** — binary cross-entropy: a feature's target is 1 iff it is
  some visible true point's nearest feature (assignments are
  stop-gradiented), so top-N-by-score selection returns real blobs;
* **match** — for each true point visible in the anchor and in view m,
  the anchor feature assigned to it must regress that point's true
  coordinates in view m through the attention matcher.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax import struct
from flax.training import train_state

from davo_tpu.data import VOWindowConfig, generate_vo_window_batch
from davo_tpu.data.rendering import (
    RenderConfig,
    render_views,
    sample_appearance,
)
from davo_tpu.models.vo_frontend import FrontendOutput, VOFrontend
from davo_tpu.types import CameraViewsAndPoints

__all__ = [
    "FrontendExperiment",
    "FrontendTrainState",
    "create_frontend_state",
    "frontend_loss",
    "make_frontend_train_step",
    "fit_frontend",
    "render_scene_batch",
]


@dataclasses.dataclass(frozen=True)
class FrontendExperiment:
    """Front-end training experiment configuration."""

    num_views: int = 4
    num_points: int = 8
    num_select: int = 8
    image_size: int = 64
    descriptor_channels: int = 64
    embedding_size: int = 64
    batch_size: int = 16
    batches_per_epoch: int = 64
    val_batches: int = 8
    epochs: int = 30
    learning_rate: float = 3e-4
    weight_decay: float = 1e-5
    clip_norm: float = 10.0
    warmup_steps: int = 200
    detection_weight: float = 1.0
    score_weight: float = 0.2
    match_weight: float = 1.0
    seed: int = 0
    window: VOWindowConfig = VOWindowConfig()
    render: RenderConfig = RenderConfig()

    def build_network(self) -> VOFrontend:
        return VOFrontend(
            num_select=self.num_select,
            descriptor_channels=self.descriptor_channels,
            embedding_size=self.embedding_size,
        )


class FrontendTrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)


def render_scene_batch(
    key: jax.Array, batch: CameraViewsAndPoints, config: RenderConfig
) -> jax.Array:
    """Render every scene of a batch: ``(B, M, H, W, C)`` images.

    Appearance is sampled per scene (shared across that scene's views —
    what makes cross-view matching possible) from a key folded out of the
    render key.
    """
    b = batch.projected_points.shape[0]
    keys = jax.random.split(key, b)

    def one(k, proj, vis):
        k_app, k_noise = jax.random.split(k)
        appearance = sample_appearance(k_app, proj.shape[1], config)
        return render_views(proj, vis, appearance, config, k_noise)

    return jax.vmap(one)(keys, batch.projected_points, batch.visibility_mask)


def frontend_loss(
    out: FrontendOutput,
    batch: CameraViewsAndPoints,
    config: FrontendExperiment,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Supervised losses against the ground-truth correspondences."""
    proj = batch.projected_points  # (B, M, N, 2)
    vis = batch.visibility_mask.astype(proj.dtype)  # (B, M, N)
    pts = out.points  # (B, M, K, 2)
    k = pts.shape[2]

    # --- detection: nearest feature per visible true point ---------------
    d2 = jnp.sum(
        jnp.square(proj[:, :, :, None, :] - pts[:, :, None, :, :]), axis=-1
    )  # (B, M, N, K)
    nearest = jnp.argmin(d2, axis=-1)  # (B, M, N)
    min_d = jnp.sqrt(jnp.min(d2, axis=-1) + 1e-12)  # (B, M, N) distances
    vis_count = jnp.maximum(jnp.sum(vis), 1.0)
    detection_loss = jnp.sum(min_d * vis) / vis_count

    # --- score: BCE against (assigned to a visible point) ----------------
    assigned = jax.lax.stop_gradient(
        jnp.clip(
            jnp.sum(
                jax.nn.one_hot(nearest, k, dtype=proj.dtype)
                * vis[..., None],
                axis=2,
            ),
            0.0,
            1.0,
        )
    )  # (B, M, K)
    score_loss = jnp.mean(
        optax.sigmoid_binary_cross_entropy(out.scores, assigned)
    )

    # --- matching: anchor-assigned features regress true coords ----------
    anchor_idx = jax.lax.stop_gradient(nearest[:, 0])  # (B, N)
    # matched coords of the anchor-assigned feature in every view
    match_pred = jnp.take_along_axis(
        out.matched, anchor_idx[:, None, :, None], axis=2
    )  # (B, M, N, 2)
    joint_vis = vis * vis[:, 0:1]  # visible in anchor AND view m
    joint_vis = joint_vis.at[:, 0].set(0.0)  # view 0 is the anchor itself
    match_err = jnp.sqrt(
        jnp.sum(jnp.square(match_pred - proj), axis=-1) + 1e-12
    )
    match_count = jnp.maximum(jnp.sum(joint_vis), 1.0)
    match_loss = jnp.sum(match_err * joint_vis) / match_count

    loss = (
        config.detection_weight * detection_loss
        + config.score_weight * score_loss
        + config.match_weight * match_loss
    )
    metrics = {
        "loss": loss,
        "detection_loss": detection_loss,
        "score_loss": score_loss,
        "match_loss": match_loss,
    }
    return loss, metrics


def _window_config(config: FrontendExperiment) -> VOWindowConfig:
    return dataclasses.replace(
        config.window,
        num_views=config.num_views,
        num_points=config.num_points,
    )


def create_frontend_state(
    config: FrontendExperiment, key: jax.Array
) -> Tuple[VOFrontend, FrontendTrainState]:
    network = config.build_network()
    init_key, data_key = jax.random.split(key)
    batch = generate_vo_window_batch(data_key, 2, _window_config(config))
    images = render_scene_batch(
        jax.random.fold_in(data_key, 1), batch, config.render
    )
    variables = network.init({"params": init_key}, images, training=False)
    total_steps = max(config.epochs * config.batches_per_epoch, 2)
    warmup = min(config.warmup_steps, total_steps // 2)
    lr = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=config.learning_rate,
        warmup_steps=warmup,
        decay_steps=max(total_steps, warmup + 1),
        end_value=0.1 * config.learning_rate,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_norm),
        optax.adamw(lr, weight_decay=config.weight_decay),
    )
    return network, FrontendTrainState.create(
        apply_fn=network.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=tx,
    )


def make_frontend_train_step(network: VOFrontend, config: FrontendExperiment):
    """Fused step: window generation + rendering + forward + loss + AdamW."""
    window_cfg = _window_config(config)

    @jax.jit
    def train_step(state: FrontendTrainState, key: jax.Array):
        k_data, k_render = jax.random.split(key)
        batch = generate_vo_window_batch(
            k_data, config.batch_size, window_cfg
        )
        images = render_scene_batch(k_render, batch, config.render)

        def loss_fn(params):
            out, mutated = network.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                training=True,
                mutable=["batch_stats"],
            )
            loss, metrics = frontend_loss(out, batch, config)
            return loss, (metrics, mutated.get("batch_stats"))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, metrics

    @jax.jit
    def eval_step(state: FrontendTrainState, key: jax.Array):
        k_data, k_render = jax.random.split(key)
        batch = generate_vo_window_batch(
            k_data, config.batch_size, window_cfg
        )
        images = render_scene_batch(k_render, batch, config.render)
        out = network.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            images,
            training=False,
        )
        _, metrics = frontend_loss(out, batch, config)
        # selection quality: fraction of solver-facing matches within one
        # rendered-blob sigma of SOME true visible point in their view
        matches = out.matches  # (B, M, N_sel, 2)
        proj = batch.projected_points
        vis = batch.visibility_mask.astype(proj.dtype)
        d2 = jnp.sum(
            jnp.square(matches[:, :, :, None, :] - proj[:, :, None, :, :]),
            axis=-1,
        )  # (B, M, Nsel, N)
        d2 = jnp.where(vis[:, :, None, :] > 0, d2, jnp.inf)
        near = jnp.sqrt(jnp.min(d2, axis=-1))
        mvis = out.match_visibility.astype(proj.dtype)
        tol = 2.0 * config.render.base_sigma
        metrics["match_inlier_rate"] = jnp.sum(
            (near < tol).astype(proj.dtype) * mvis
        ) / jnp.maximum(jnp.sum(mvis), 1.0)
        return metrics

    return train_step, eval_step


def fit_frontend(config: FrontendExperiment, log_fn=None):
    """Train the front-end; returns ``(state, history)``."""
    key = jax.random.key(config.seed)
    network, state = create_frontend_state(config, key)
    train_step, eval_step = make_frontend_train_step(network, config)
    history = {"train": [], "val": []}
    step_key = jax.random.fold_in(key, 1)
    for epoch in range(config.epochs):
        t0 = time.time()
        agg = None
        for i in range(config.batches_per_epoch):
            k = jax.random.fold_in(step_key, epoch * 100003 + i)
            state, metrics = train_step(state, k)
            agg = (
                metrics
                if agg is None
                else jax.tree_util.tree_map(jnp.add, agg, metrics)
            )
        train_metrics = {
            name: float(v) / config.batches_per_epoch
            for name, v in agg.items()
        }
        train_metrics["epoch_seconds"] = time.time() - t0
        history["train"].append(train_metrics)
        if log_fn is not None:
            log_fn("train", epoch, train_metrics)
        if config.val_batches > 0:
            agg = None
            for i in range(config.val_batches):
                k = jax.random.fold_in(step_key, 777000 + epoch * 1009 + i)
                metrics = eval_step(state, k)
                agg = (
                    metrics
                    if agg is None
                    else jax.tree_util.tree_map(jnp.add, agg, metrics)
                )
            val_metrics = {
                name: float(v) / config.val_batches for name, v in agg.items()
            }
            history["val"].append(val_metrics)
            if log_fn is not None:
                log_fn("val", epoch, val_metrics)
    return state, history
