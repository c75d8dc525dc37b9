"""Training harness for gen-1 guess+solver models.

The analogue of the reference's ``CameraOptmisationTrainingModule`` (sic,
``training_modules/camera_optimisation_training_module.py``): loss =
MSE(focal length) + MSE(cx) + MSE(cy) + mean residual BA error of the
solved model, AdamW lr 1e-4.  When the model emits E estimates, the
intrinsics losses use the lowest-error estimate per problem.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core

from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.solve import BFGSConfig
from davo_tpu.camera import PinholeBAConfig
from davo_tpu.models import GuessAndSolverModel, PinholeMLPGuess
from .calibration import TrainState

__all__ = [
    "OptimisationExperiment",
    "create_optimisation_state",
    "make_optimisation_train_step",
    "fit_optimisation",
]


@dataclasses.dataclass(frozen=True)
class OptimisationExperiment:
    """Gen-1 experiment configuration (reference YAML presets)."""

    num_views: int = 4
    num_points: int = 8
    hidden_size: int = -1
    batch_size: int = 64
    batches_per_epoch: int = 128
    epochs: int = 50
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    clip_norm: float = 1.0
    seed: int = 0
    dtype: Any = jnp.float32
    ba: PinholeBAConfig = PinholeBAConfig(constrain=True)
    solver: BFGSConfig = BFGSConfig(
        error_threshold=1e-6,
        iterations=10,
        drop_path_p=0.0,
        line_search_iterations=40,
        max_step_size=1e5,
    )
    solver_enabled: bool = True  # False: guess-only (mlp_guess preset)

    def resolved_scene(self) -> SceneConfig:
        return SceneConfig(
            num_views=self.num_views, num_points=self.num_points, dtype=self.dtype
        )

    def build_model(self):
        guess = PinholeMLPGuess(
            num_views=self.num_views,
            num_points=self.num_points,
            num_hidden=self.hidden_size,
        )
        if not self.solver_enabled:
            from davo_tpu.models import InitialGuessModel

            return InitialGuessModel(initial_guess=guess, ba_config=self.ba)
        return GuessAndSolverModel(
            initial_guess=guess, ba_config=self.ba, solver=self.solver
        )


def create_optimisation_state(config: OptimisationExperiment, key: jax.Array):
    model = config.build_model()
    init_key, data_key = jax.random.split(key)
    sample = generate_batch(data_key, 2, config.resolved_scene())
    variables = model.init(
        {"params": init_key},
        sample.projected_points,
        sample.visibility_mask,
        training=False,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_norm),
        optax.adamw(config.learning_rate, weight_decay=config.weight_decay),
    )
    return model, TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=tx,
    )


def make_optimisation_train_step(model, config: OptimisationExperiment):
    scene_cfg = config.resolved_scene()

    @jax.jit
    def train_step(state: TrainState, key: jax.Array):
        data_key, drop_key = jax.random.split(key)
        batch = generate_batch(data_key, config.batch_size, scene_cfg)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch.projected_points,
                batch.visibility_mask,
                training=True,
                return_error=True,
                rngs={"drop_path": drop_key},
                mutable=["batch_stats"],
            )
            solved, error = outputs  # error: (B, E)
            best = jnp.argmin(error, axis=-1)
            take = lambda x: jnp.take_along_axis(
                x, best[:, None], axis=1
            )[:, 0]
            f = take(solved.focal_length)
            cx = take(solved.cx)
            cy = take(solved.cy)
            true = batch.camera_intrinsics
            f_loss = jnp.mean(jnp.square(f - true[:, 0]))
            cx_loss = jnp.mean(jnp.square(cx - true[:, 1]))
            cy_loss = jnp.mean(jnp.square(cy - true[:, 2]))
            mean_error = jnp.mean(error)
            loss = f_loss + cx_loss + cy_loss + mean_error
            metrics = {
                "loss": loss,
                "mean_error": mean_error,
                "focal_length_loss": f_loss,
                "cx_loss": cx_loss,
                "cy_loss": cy_loss,
            }
            return loss, (metrics, mutated.get("batch_stats", state.batch_stats))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads, batch_stats=new_stats), metrics

    return train_step


def fit_optimisation(
    config: OptimisationExperiment,
    *,
    epochs: Optional[int] = None,
    log_fn: Optional[Callable[[str, int, Dict[str, float]], None]] = None,
):
    """Train a gen-1 guess(+solver) model; returns (state, history)."""
    key = jax.random.key(config.seed)
    init_key, key = jax.random.split(key)
    model, state = create_optimisation_state(config, init_key)
    train_step = make_optimisation_train_step(model, config)
    history = {"train": []}
    num_epochs = epochs if epochs is not None else config.epochs
    for epoch in range(num_epochs):
        start = time.time()
        metrics = []
        for _ in range(config.batches_per_epoch):
            key, step_key = jax.random.split(key)
            state, m = train_step(state, step_key)
            metrics.append(m)
        avg = {
            k: float(jnp.mean(jnp.stack([m[k] for m in metrics])))
            for k in metrics[0]
        }
        avg["epoch_seconds"] = time.time() - start
        history["train"].append(avg)
        if log_fn is not None:
            log_fn("train", epoch, avg)
    return state, history
