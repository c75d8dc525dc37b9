"""Training experiment for the learned solvers (MLP / transformer steps).

The reference implements learned solver steps (``solvers/mlp_solver.py``,
``solvers/transformer_solver.py``) but ships no experiment that trains
them; this harness closes that unproven row: the solver network is trained
to reduce the calibration objective from noisy starts around the truth,
and evaluated head-to-head against BFGS at the **same step budget** (each
learned step probes the objective twice — direction + line-search probe —
which is cheaper than a BFGS iteration's line search, so the budget
comparison favours BFGS).

Starts are drawn as ``truth + sigma * noise`` (the measured basin regime
from ROADMAP.md: at sigma 0.5 BFGS lands in the truth basin ~69% of the
time), so the learned solver's job is exactly the reference's design
intent: replace the hand-derived update rule on in-distribution problems.
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

from davo_tpu.camera import calibration_error, num_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models.learned_solvers import MLPSolver, TransformerSolver
from davo_tpu.solve import BFGSConfig, bfgs_solve
from davo_tpu.types import CameraViewsAndPoints

__all__ = [
    "LearnedSolverExperiment",
    "true_calibration_vector",
    "fit_learned_solver",
    "compare_with_bfgs",
]


def true_calibration_vector(batch: CameraViewsAndPoints) -> jax.Array:
    """Ground-truth scenes as flat gen-2 calibration vectors ``(B, P)``.

    The focal slot stores the pre-activation value of the ``elu(f) + 1``
    parametrisation (``geometry/homogeneous_projection.py:37`` in the
    reference), i.e. ``f - 1`` for ``f >= 1`` and ``log f`` below.
    """
    intr = batch.camera_intrinsics
    f = intr[:, 0]
    f_param = jnp.where(f >= 1.0, f - 1.0, jnp.log(jnp.maximum(f, 1e-6)))
    b = intr.shape[0]
    return jnp.concatenate(
        [
            jnp.stack([f_param, intr[:, 1], intr[:, 2]], axis=-1),
            batch.world_points.reshape(b, -1),
            batch.camera_translations.reshape(b, -1),
            batch.camera_orientations.reshape(b, -1),
        ],
        axis=-1,
    )


@dataclasses.dataclass(frozen=True)
class LearnedSolverExperiment:
    """Train a learned solver on the calibration objective."""

    solver_type: str = "mlp"  # "mlp" | "transformer" | "direction"
    num_steps: int = 5
    recurrent: bool = True
    # Training signal (round-3, VERDICT r2 next #6):
    #  - "final": objective value after the last step (round-2 signal —
    #    measured to diverge: credit never reaches early steps).
    #  - "descent": per-step descent-aligned loss, mean over steps of
    #    err_t / stop_grad(err_{t-1}) — every step is rewarded for its OWN
    #    relative decrease against a detached baseline.
    # "direction" solver_type ignores this and trains the cheap
    # SearchDirectionHeuristic gate INSIDE bfgs_solve (the gen-1
    # IModifySearchDirections hook) on the final objective.
    loss_mode: str = "final"
    num_views: int = 4
    num_points: int = 8
    hidden_size: int = 256
    embed_dim: int = 128  # transformer
    num_heads: int = 4
    start_noise: float = 0.5
    batch_size: int = 256
    batches_per_epoch: int = 64
    epochs: int = 30
    learning_rate: float = 1e-4
    weight_decay: float = 1e-5
    clip_norm: float = 1.0
    seed: int = 0
    scene: SceneConfig = SceneConfig()

    @property
    def num_parameters(self) -> int:
        return num_calibration_parameters(self.num_views, self.num_points)

    def build_network(self):
        if self.solver_type == "direction":
            from davo_tpu.models.learned_solvers import (
                SearchDirectionHeuristic,
            )

            return SearchDirectionHeuristic(
                num_parameters=self.num_parameters,
                hidden_size=self.hidden_size,
            )
        if self.solver_type == "mlp":
            return MLPSolver(
                num_steps=self.num_steps,
                num_parameters=self.num_parameters,
                search_direction_hidden=self.hidden_size,
                line_search_hidden=self.hidden_size,
                recurrent=self.recurrent,
            )
        if self.solver_type == "transformer":
            return TransformerSolver(
                num_steps=self.num_steps,
                num_parameters=self.num_parameters,
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                recurrent=self.recurrent,
            )
        raise ValueError(f"Unknown solver_type: {self.solver_type!r}")

    def resolved_scene(self) -> SceneConfig:
        return dataclasses.replace(
            self.scene,
            num_views=self.num_views,
            num_points=self.num_points,
        )


class LearnedSolverState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)


def _make_problem(config: LearnedSolverExperiment, key: jax.Array):
    """Scenes, noisy starts ``(B, 1, P)``, and the batched error_fn."""
    k_data, k_noise = jax.random.split(key)
    batch = generate_batch(k_data, config.batch_size, config.resolved_scene())
    truth = true_calibration_vector(batch)
    starts = truth + config.start_noise * jax.random.normal(
        k_noise, truth.shape, truth.dtype
    )
    visibility = batch.visibility_mask.astype(truth.dtype)

    def error_fn(parameters):
        # parameters (B, E, P); observations broadcast over E
        return calibration_error(
            parameters,
            batch.projected_points[:, None],
            visibility[:, None],
        )

    return batch, truth, starts[:, None, :], error_fn


def create_learned_solver_state(
    config: LearnedSolverExperiment, key: jax.Array
):
    network = config.build_network()
    init_key, data_key = jax.random.split(key)
    _, _, starts, error_fn = _make_problem(
        dataclasses.replace(config, batch_size=2), data_key
    )
    if config.solver_type == "direction":
        variables = network.init(
            {"params": init_key},
            starts[:, 0, :],
            jnp.zeros(()),
            training=False,
        )
    else:
        variables = network.init(
            {"params": init_key}, starts, error_fn, training=False
        )
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_norm),
        optax.adamw(config.learning_rate, weight_decay=config.weight_decay),
    )
    return network, LearnedSolverState.create(
        apply_fn=network.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=tx,
    )


def make_learned_solver_step(network, config: LearnedSolverExperiment):
    @jax.jit
    def train_step(state: LearnedSolverState, key: jax.Array):
        _, _, starts, error_fn = _make_problem(config, key)

        def loss_fn(params):
            if config.solver_type == "direction":
                # train the direction gate inside the real BFGS solve.
                # BatchNorm runs on its stored statistics (the gate is
                # called inside bfgs_solve's scan, where stat mutation
                # would leak tracers); parameters remain trainable.
                def direction_fn(direction, p, err, step_idx):
                    return network.apply(
                        {
                            "params": params,
                            "batch_stats": state.batch_stats,
                        },
                        direction,
                        step_idx,
                        training=False,
                    )

                flat = starts[:, 0, :]
                flat_error = lambda q: error_fn(q[:, None, :])[:, 0]
                solved = bfgs_solve(
                    flat_error,
                    flat,
                    BFGSConfig(
                        iterations=config.num_steps,
                        training_iterations=config.num_steps,
                        error_threshold=0.0,
                        line_search_iterations=16,
                        drop_path_p=0.0,
                    ),
                    training=True,
                    direction_fn=direction_fn,
                )
                final_error = jnp.mean(flat_error(solved))
                loss = final_error
                new_stats = state.batch_stats
                start_error = jnp.mean(flat_error(flat))
            else:
                trajectory, mutated = network.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    starts,
                    error_fn,
                    training=True,
                    return_trajectory=True,
                    mutable=["batch_stats"],
                )
                new_stats = mutated.get("batch_stats")
                errors = jax.vmap(error_fn)(trajectory)  # (T, B, E)
                final_error = jnp.mean(errors[-1])
                start_error = jnp.mean(error_fn(starts))
                if config.loss_mode == "descent":
                    prev = jnp.concatenate(
                        [
                            error_fn(starts)[None],
                            errors[:-1],
                        ]
                    )
                    baseline = jax.lax.stop_gradient(
                        jnp.maximum(prev, 1e-6)
                    )
                    # clip the per-step reward at halving: the raw ratio
                    # mean is GAMEABLE (measured: blow up err_1, then
                    # collect easy relative decreases — ratio loss 1.16
                    # while the final error rose to 31.9), and add a
                    # log-final term so the absolute landing point counts
                    ratios = jnp.maximum(errors / baseline, 0.5)
                    loss = jnp.mean(ratios) + 0.5 * jnp.mean(
                        jnp.log(errors[-1] + 1e-6)
                    )
                elif config.loss_mode == "final":
                    loss = final_error
                else:
                    raise ValueError(
                        f"Unknown loss_mode: {config.loss_mode!r}"
                    )
            metrics = {
                "loss": loss,
                "final_error": final_error,
                "start_error": start_error,
                "improvement": start_error - final_error,
            }
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, metrics

    return train_step


def fit_learned_solver(config: LearnedSolverExperiment, log_fn=None):
    key = jax.random.key(config.seed)
    network, state = create_learned_solver_state(config, key)
    train_step = make_learned_solver_step(network, config)
    history = {"train": []}
    for epoch in range(config.epochs):
        t0 = time.time()
        agg = None
        for i in range(config.batches_per_epoch):
            k = jax.random.fold_in(key, 17 + epoch * 100003 + i)
            state, metrics = train_step(state, k)
            agg = (
                metrics
                if agg is None
                else jax.tree_util.tree_map(jnp.add, agg, metrics)
            )
        row = {
            name: float(v) / config.batches_per_epoch for name, v in agg.items()
        }
        row["epoch_seconds"] = time.time() - t0
        history["train"].append(row)
        if log_fn is not None:
            log_fn("train", epoch, row)
    return network, state, history


def compare_with_bfgs(
    network,
    state,
    config: LearnedSolverExperiment,
    key: jax.Array,
    batches: int = 8,
) -> Dict[str, Dict[str, float]]:
    """Head-to-head table: learned solver vs BFGS at equal / 4x budget.

    All solvers see the SAME noisy starts.  Reported per solver: mean
    final objective, mean absolute focal error, and the fraction of
    elements with focal error < 0.1 (the basin-hit rate from ROADMAP.md).
    """

    def focal_metrics(solved_flat, batch):
        f_pred = jax.nn.elu(solved_flat[:, 0]) + 1.0
        f_err = jnp.abs(f_pred - batch.camera_intrinsics[:, 0])
        return jnp.mean(f_err), jnp.mean((f_err < 0.1).astype(f_err.dtype))

    bfgs_equal = BFGSConfig(
        iterations=config.num_steps,
        error_threshold=0.0,
        line_search_iterations=16,
        drop_path_p=0.0,
    )
    bfgs_4x = dataclasses.replace(bfgs_equal, iterations=4 * config.num_steps)

    @jax.jit
    def eval_batch(key):
        batch, truth, starts, error_fn = _make_problem(config, key)
        flat_error = lambda p: error_fn(p[:, None, :])[:, 0]
        if config.solver_type == "direction":

            def direction_fn(direction, p, err, step_idx):
                return network.apply(
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                    },
                    direction,
                    step_idx,
                    training=False,
                )

            learned = bfgs_solve(
                flat_error, starts[:, 0], bfgs_equal,
                direction_fn=direction_fn,
            )
        else:
            learned = network.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                starts,
                error_fn,
                training=False,
            )[:, 0]
        rows = {}
        for name, solved in (
            ("start", starts[:, 0]),
            ("learned", learned),
            ("bfgs_equal_budget", bfgs_solve(flat_error, starts[:, 0], bfgs_equal)),
            ("bfgs_4x_budget", bfgs_solve(flat_error, starts[:, 0], bfgs_4x)),
        ):
            err = jnp.mean(flat_error(solved))
            f_err, basin = focal_metrics(solved, batch)
            rows[name] = {
                "objective": err,
                "focal_error": f_err,
                "basin_rate": basin,
            }
        return rows

    agg = None
    for i in range(batches):
        rows = eval_batch(jax.random.fold_in(key, 900 + i))
        agg = (
            rows if agg is None else jax.tree_util.tree_map(jnp.add, agg, rows)
        )
    return {
        solver: {name: float(v) / batches for name, v in row.items()}
        for solver, row in agg.items()
    }
