"""Jitted training harness for the calibration network.

Replaces the reference's Lightning stack
(``training_modules/camera_calibration_training_module.py`` +
``camera_calibration_from_oracle_matches.py``): a single jitted train step
fuses on-device data generation, the forward solve, the loss, and the AdamW
update into one XLA program.  Metric names/semantics follow the reference
("mean error", "focal length loss", "cx loss", "cy loss", summed loss).

Note one deliberate bug-fix relative to the reference: the network's focal
parameter lives in ``elu(f)+1`` space, so the focal-length loss compares
the *effective* focal length against the ground truth (the reference
compared the raw parameter slice, ``:49-51``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core
from flax import struct
from flax.training import train_state

from davo_tpu.camera import BasinScoreConfig, unpack_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.models.calibration_network import CalibrationNetwork
from davo_tpu.solve import BFGSConfig
from davo_tpu.types import CameraViewsAndPoints

__all__ = [
    "CalibrationExperiment",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "fit",
]


@dataclasses.dataclass(frozen=True)
class CalibrationExperiment:
    """The canonical oracle-match calibration experiment.

    Defaults reproduce ``camera_calibration_from_oracle_matches.py:34-75``:
    4 views x 8 points, hidden 8*M*N, batch 64, 128 train batches/epoch,
    50 epochs, AdamW lr 1e-4.
    """

    num_views: int = 4
    num_points: int = 8
    hidden_size: int = -1  # <=0: 8 * M * N (scripted-main default)
    batch_size: int = 64
    batches_per_epoch: int = 128
    val_batches: int = 16
    epochs: int = 50
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    # Gradients through the unrolled solve are heavy-tailed (norms in the
    # thousands at init); clipping is essential for stable training.
    clip_norm: float = 1.0
    # "constant" or "warmup_cosine" (linear warmup to learning_rate, then
    # cosine decay to 10% over the configured epoch budget — the
    # transformer head diverges without it).
    schedule: str = "warmup_cosine"
    warmup_steps: int = 500
    # Weight of the (gauge-normalised) pose/point supervision.  The
    # reference supervises only the intrinsics + solver error
    # (``camera_calibration_training_module.py``); the synthetic data has
    # full ground truth, and supervising the structure steers the guess
    # into the correct basin of the (projectively ambiguous) objective
    # far faster.  Set 0 for reference-parity behaviour.
    structure_weight: float = 1.0
    # Multi-start eval solves (best-of-E); training always single-start.
    num_restarts: int = 1
    restart_noise: float = 0.1
    # "noise" (Gaussian around the guess) or "permutation" (head applied
    # to point-permuted scenes — informed diversity).
    restart_proposals: str = "noise"
    # Restart selection: "error" (raw reprojection) or "basin"
    # (plausibility-penalised, davo_tpu.camera.basin_score).
    selection: str = "error"
    # anchor_weight of the basin score (pull towards the guess's focal).
    basin_anchor_weight: float = 0.0
    # Guess head: "mlp" (reference) or "transformer" (per-observation
    # tokens + attention).
    head: str = "mlp"
    transformer_layers: int = 3
    transformer_heads: int = 4
    # Readout tokens of the transformer head (E parallel guesses, trained
    # winner-take-all; eval uses them as restart proposals with
    # restart_proposals="tokens").
    guess_tokens: int = 1
    # Training-scene distribution: "scenes" (reference-style camera
    # clusters) or "vo_windows" (orbit-arc keyframe windows matching the
    # windowed-VO geometry, davo_tpu.data.vo_windows).
    data_source: str = "scenes"
    # Observation-noise augmentation std on the training projections
    # (robustness to learned-match coordinate noise; 0 = exact oracle).
    pixel_noise: float = 0.0
    # Verified-match-distribution augmentation (vo_windows source only):
    # per-view visibility dropout cap and wrong-assignment fraction —
    # see davo_tpu.data.VOWindowConfig.
    visibility_dropout: float = 0.0
    outlier_fraction: float = 0.0
    seed: int = 0
    dtype: Any = jnp.float32
    scene: Optional[SceneConfig] = None
    # Reference thresholds (networks/calibration_network.py:44) with a
    # bounded training unroll: training differentiates through the solve,
    # so its iteration budget is a compiled scan length (SURVEY §7.3);
    # eval uses a while_loop and can afford the full budget.
    solver: Any = BFGSConfig(  # BFGSConfig or LBFGSConfig
        error_threshold=1e-7,
        training_error_threshold=1e-3,
        iterations=100,
        training_iterations=10,
        line_search_iterations=50,
    )

    def resolved_scene(self) -> SceneConfig:
        if self.scene is not None:
            return self.scene
        return SceneConfig(
            num_views=self.num_views,
            num_points=self.num_points,
            pixel_noise=self.pixel_noise,
            dtype=self.dtype,
        )

    def resolved_hidden(self) -> int:
        if self.hidden_size > 0:
            return self.hidden_size
        return 8 * self.num_views * self.num_points

    def make_batch_fn(self):
        """``(key, batch_size) -> CameraViewsAndPoints`` for the configured
        scene distribution."""
        if self.data_source == "scenes":
            scene_cfg = self.resolved_scene()
            return lambda key, batch_size: generate_batch(
                key, batch_size, scene_cfg
            )
        if self.data_source == "vo_windows":
            from davo_tpu.data import VOWindowConfig, generate_vo_window_batch

            window_cfg = VOWindowConfig(
                num_views=self.num_views,
                num_points=self.num_points,
                pixel_noise=self.pixel_noise,
                visibility_dropout=self.visibility_dropout,
                outlier_fraction=self.outlier_fraction,
                dtype=self.dtype,
            )
            return lambda key, batch_size: generate_vo_window_batch(
                key, batch_size, window_cfg
            )
        raise ValueError(f"Unknown data_source: {self.data_source!r}")

    def build_network(self) -> CalibrationNetwork:
        return CalibrationNetwork(
            num_views=self.num_views,
            num_points=self.num_points,
            hidden_size=self.resolved_hidden(),
            solver=self.solver,
            num_restarts=self.num_restarts,
            restart_noise=self.restart_noise,
            restart_proposals=self.restart_proposals,
            selection=self.selection,
            basin=BasinScoreConfig(anchor_weight=self.basin_anchor_weight),
            head=self.head,
            transformer_layers=self.transformer_layers,
            transformer_heads=self.transformer_heads,
            guess_tokens=self.guess_tokens,
        )


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)


def create_train_state(
    config: CalibrationExperiment, key: jax.Array
) -> Tuple[CalibrationNetwork, TrainState]:
    network = config.build_network()
    init_key, data_key = jax.random.split(key)
    sample = config.make_batch_fn()(data_key, 2)
    variables = network.init(
        {"params": init_key},
        sample.projected_points,
        sample.visibility_mask,
        training=False,
    )
    if config.schedule == "warmup_cosine":
        total_steps = max(config.epochs * config.batches_per_epoch, 2)
        warmup = min(config.warmup_steps, total_steps // 2)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.learning_rate,
            warmup_steps=warmup,
            decay_steps=max(total_steps, warmup + 1),
            end_value=0.1 * config.learning_rate,
        )
    elif config.schedule == "constant":
        lr = config.learning_rate
    else:
        raise ValueError(f"Unknown schedule: {config.schedule!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(config.clip_norm),
        optax.adamw(lr, weight_decay=config.weight_decay),
    )
    return network, TrainState.create(
        apply_fn=network.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        tx=tx,
    )


def _structure_targets(batch: CameraViewsAndPoints):
    """Gauge-normalised ground-truth structure: the scale-representative
    with mean |coordinate| = 1 over points+camera centres — the same
    normalisation the objective applies internally
    (``get_camera_relative_points``), so it is the canonical member of the
    true solution's gauge orbit."""
    wp = batch.world_points  # (B, N, 3)
    tr = batch.camera_translations  # (B, M-1, 3)
    n = wp.shape[1]
    m = tr.shape[1] + 1
    points_scale = jnp.mean(jnp.abs(wp), axis=(-1, -2))
    camera_scale = jnp.mean(jnp.abs(tr), axis=(-1, -2))
    scale = (points_scale * n + camera_scale * m) / (n + m)
    scale = jnp.maximum(scale, 1e-6)[:, None, None]
    return wp / scale, tr / scale


def _winner_take_all_loss(
    network: CalibrationNetwork,
    predictions: jax.Array,
    error: jax.Array,
    batch: CameraViewsAndPoints,
    structure_weight: float,
):
    """Per-element min-over-tokens supervised loss for multi-token heads.

    ``predictions``: ``(B, E, P)`` raw token guesses; ``error``: ``(B, E)``
    per-token objective values.  The loss is the mean over elements of the
    best token's total; reported metrics are the same names as the
    single-guess path, evaluated at each element's winning token, plus the
    token-usage entropy (collapse diagnostic: ~log E when all tokens win
    equally often, 0 when one token always wins).
    """
    b, e, _ = predictions.shape
    unpacked = unpack_calibration_parameters(
        predictions, network.num_views, network.num_points
    )
    pred_intrinsics = unpacked.intrinsics.reshape(b, e, 3)
    pred_focal = jax.nn.elu(pred_intrinsics[..., 0]) + 1.0
    true_intrinsics = batch.camera_intrinsics[:, None, :]  # (B, 1, 3)
    focal_se = jnp.square(pred_focal - true_intrinsics[..., 0])
    cx_se = jnp.square(pred_intrinsics[..., 1] - true_intrinsics[..., 1])
    cy_se = jnp.square(pred_intrinsics[..., 2] - true_intrinsics[..., 2])
    total = focal_se + cx_se + cy_se + error  # (B, E)
    components = {
        "focal_length_loss": focal_se,
        "cx_loss": cx_se,
        "cy_loss": cy_se,
        "mean_error": error,
    }
    if structure_weight > 0.0:
        true_points, true_trans = _structure_targets(batch)
        pred_points = unpacked.world_points[:, :, 0]  # (B, E, N, 3)
        pred_trans = unpacked.camera_translations[:, :, :, 0]  # (B, E, M-1, 3)
        pred_rot = unpacked.camera_rotations[:, :, :, 0]
        structure_se = (
            jnp.mean(
                jnp.square(pred_points - true_points[:, None]), axis=(-1, -2)
            )
            + jnp.mean(
                jnp.square(pred_trans - true_trans[:, None]), axis=(-1, -2)
            )
            + jnp.mean(
                jnp.square(pred_rot - batch.camera_orientations[:, None]),
                axis=(-1, -2),
            )
        )
        total = total + structure_weight * structure_se
        components["structure_loss"] = structure_se
    best = jnp.argmin(total, axis=-1)  # (B,)
    pick = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
    loss = jnp.mean(pick(total))
    metrics = {name: jnp.mean(pick(v)) for name, v in components.items()}
    metrics["loss"] = loss
    usage = jnp.mean(jax.nn.one_hot(best, e), axis=0)  # (E,)
    metrics["token_usage_entropy"] = -jnp.sum(
        usage * jnp.log(jnp.maximum(usage, 1e-12))
    )
    return loss, metrics


def _loss_and_metrics(
    network: CalibrationNetwork,
    params,
    batch_stats,
    batch: CameraViewsAndPoints,
    *,
    training: bool,
    drop_key: Optional[jax.Array],
    structure_weight: float = 0.0,
):
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"drop_path": drop_key} if drop_key is not None else None
    outputs = network.apply(
        variables,
        batch.projected_points,
        batch.visibility_mask,
        training=training,
        return_error=True,
        rngs=rngs,
        mutable=["batch_stats"] if training else [],
    )
    (predictions, error), mutated = outputs
    if predictions.ndim == 3:
        # multi-token guess head (guess_tokens > 1): winner-take-all —
        # each element is scored by its BEST token, so tokens specialise
        # into diverse proposals instead of collapsing onto the mean
        loss, metrics = _winner_take_all_loss(
            network, predictions, error, batch, structure_weight
        )
        new_batch_stats = (
            mutated.get("batch_stats", batch_stats) if training else batch_stats
        )
        return loss, (metrics, new_batch_stats)
    unpacked = unpack_calibration_parameters(
        predictions, network.num_views, network.num_points
    )
    pred_intrinsics = unpacked.intrinsics.reshape(predictions.shape[0], 3)
    pred_focal = jax.nn.elu(pred_intrinsics[:, 0]) + 1.0
    true_intrinsics = batch.camera_intrinsics
    focal_loss = jnp.mean(jnp.square(pred_focal - true_intrinsics[:, 0]))
    cx_loss = jnp.mean(jnp.square(pred_intrinsics[:, 1] - true_intrinsics[:, 1]))
    cy_loss = jnp.mean(jnp.square(pred_intrinsics[:, 2] - true_intrinsics[:, 2]))
    mean_error = jnp.mean(error)
    loss = focal_loss + cx_loss + cy_loss + mean_error
    metrics = {
        "loss": loss,
        "mean_error": mean_error,
        "focal_length_loss": focal_loss,
        "cx_loss": cx_loss,
        "cy_loss": cy_loss,
    }
    if structure_weight > 0.0:
        true_points, true_trans = _structure_targets(batch)
        pred_points = unpacked.world_points[:, 0]  # (B, N, 3)
        pred_trans = unpacked.camera_translations[:, :, 0]  # (B, M-1, 3)
        pred_rot = unpacked.camera_rotations[:, :, 0]
        structure_loss = (
            jnp.mean(jnp.square(pred_points - true_points))
            + jnp.mean(jnp.square(pred_trans - true_trans))
            + jnp.mean(jnp.square(pred_rot - batch.camera_orientations))
        )
        loss = loss + structure_weight * structure_loss
        metrics["structure_loss"] = structure_loss
        metrics["loss"] = loss
    new_batch_stats = (
        mutated.get("batch_stats", batch_stats) if training else batch_stats
    )
    return loss, (metrics, new_batch_stats)


def make_train_step(network: CalibrationNetwork, config: CalibrationExperiment):
    """One fused train step: on-device scene generation + forward solve +
    loss + AdamW update, all inside a single jit."""

    batch_fn = config.make_batch_fn()

    @jax.jit
    def train_step(state: TrainState, key: jax.Array):
        data_key, drop_key = jax.random.split(key)
        batch = batch_fn(data_key, config.batch_size)

        def loss_fn(params):
            return _loss_and_metrics(
                network,
                params,
                state.batch_stats,
                batch,
                training=True,
                drop_key=drop_key,
                structure_weight=config.structure_weight,
            )

        grads, (metrics, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(
            grads=grads, batch_stats=new_batch_stats
        )
        return new_state, metrics

    return train_step


def make_eval_step(network: CalibrationNetwork, config: CalibrationExperiment):
    batch_fn = config.make_batch_fn()

    @jax.jit
    def eval_step(state: TrainState, key: jax.Array):
        batch = batch_fn(key, config.batch_size)
        _, (metrics, _) = _loss_and_metrics(
            network,
            state.params,
            state.batch_stats,
            batch,
            training=False,
            drop_key=None,
            structure_weight=config.structure_weight,
        )
        return metrics

    return eval_step


def evaluate_calibration_ate(
    network: CalibrationNetwork,
    state: TrainState,
    config: CalibrationExperiment,
    key: jax.Array,
    batches: int = 4,
) -> Dict[str, float]:
    """Accuracy of the solved scenes against ground truth: per-scene ATE
    of the recovered camera trajectory (after similarity alignment — the
    estimate is gauge-free) plus intrinsics errors.

    This is the BASELINE.md accuracy metric on the synthetic oracle-match
    sequences.
    """
    from davo_tpu.camera import unpack_calibration_parameters
    from .evaluation import (
        absolute_trajectory_error,
        camera_centers_from_poses,
    )

    batch_fn = config.make_batch_fn()

    @jax.jit
    def solve_batch(batch_key):
        batch = batch_fn(batch_key, config.batch_size)
        predictions = network.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.projected_points,
            batch.visibility_mask,
            training=False,
        )
        unpacked = unpack_calibration_parameters(
            predictions, network.num_views, network.num_points
        )
        est_orient = unpacked.camera_rotations[:, :, 0, :]
        est_trans = unpacked.camera_translations[:, :, 0, :]
        zero = jnp.zeros_like(est_orient[:, :1])
        est_centres = camera_centers_from_poses(
            jnp.concatenate([zero, est_orient], axis=1),
            jnp.concatenate([zero, est_trans], axis=1),
        )
        true_centres = camera_centers_from_poses(
            jnp.concatenate([zero, batch.camera_orientations], axis=1),
            jnp.concatenate([zero, batch.camera_translations], axis=1),
        )
        rmse = jax.vmap(
            lambda e, t: absolute_trajectory_error(e, t)["rmse"]
        )(est_centres, true_centres)
        pred_f = jax.nn.elu(unpacked.intrinsics[..., 0, 0, 0]) + 1.0
        f_err = jnp.abs(pred_f - batch.camera_intrinsics[:, 0])
        c_err = jnp.abs(
            unpacked.intrinsics[:, 0, 0, 1:] - batch.camera_intrinsics[:, 1:]
        )
        return rmse, f_err, c_err

    rmses, f_errs, c_errs = [], [], []
    for i in range(batches):
        rmse, f_err, c_err = solve_batch(jax.random.fold_in(key, i))
        rmses.append(rmse)
        f_errs.append(f_err)
        c_errs.append(c_err)
    rmses = jnp.concatenate(rmses)
    return {
        "ate_rmse_mean": float(jnp.mean(rmses)),
        "ate_rmse_median": float(jnp.median(rmses)),
        "f_error_mean": float(jnp.mean(jnp.concatenate(f_errs))),
        "centre_error_mean": float(jnp.mean(jnp.concatenate(c_errs))),
    }


def fit(
    config: CalibrationExperiment,
    *,
    epochs: Optional[int] = None,
    log_fn: Callable[[str, int, Dict[str, float]], None] = None,
    initial_state: Optional[TrainState] = None,
    epoch_offset: int = 0,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 25,
) -> Tuple[TrainState, Dict[str, list]]:
    """Train the calibration network; returns the final state + history.

    ``initial_state`` resumes from an existing state (curriculum stages or
    checkpoint restore); the optimiser schedule continues from the state's
    step count.  ``epoch_offset`` only shifts the epoch passed to
    ``log_fn`` and the data keys so stages do not repeat batches.

    ``checkpoint_dir`` enables failure recovery: the FULL train state
    (params, batch stats, optimiser state, step) is checkpointed every
    ``checkpoint_every`` epochs, and a fresh ``fit`` pointed at the same
    directory resumes from the latest checkpoint instead of epoch 0 —
    a killed or preempted run loses at most ``checkpoint_every`` epochs.
    """
    key = jax.random.key(config.seed)
    if epoch_offset:
        key = jax.random.fold_in(key, epoch_offset)
    init_key, key = jax.random.split(key)
    network, state = create_train_state(config, init_key)
    if initial_state is not None:
        state = initial_state
    start_epoch = 0
    if checkpoint_dir is not None and initial_state is None:
        from .checkpoint import latest_step, restore_checkpoint

        resume_epoch = latest_step(checkpoint_dir)
        if resume_epoch is not None and resume_epoch - epoch_offset < 0:
            # checkpoint predates this stage (saved by an earlier
            # curriculum stage) — nothing to resume here
            resume_epoch = None
        if resume_epoch is not None:
            num_epochs_local = epochs if epochs is not None else config.epochs
            if resume_epoch - epoch_offset > num_epochs_local:
                # checkpoint steps are GLOBAL epochs (epoch + 1 +
                # epoch_offset); silently treating one as local made
                # curriculum restarts skip stage 0 and retrain later
                # stages under the wrong FOV distribution (ADVICE r2)
                raise ValueError(
                    f"checkpoint at global epoch {resume_epoch} is beyond "
                    f"this stage (epoch_offset={epoch_offset}, "
                    f"epochs={num_epochs_local}); use fit_fov_curriculum's "
                    "cross-stage auto-resume or restore manually"
                )
            # restore with an abstract target mirroring the live state so
            # orbax rebuilds the exact pytree structure (incl. the optax
            # chain's namedtuple nodes)
            template = {
                "params": state.params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": jnp.asarray(state.step),
            }
            restored = restore_checkpoint(
                checkpoint_dir,
                resume_epoch,
                abstract_state=jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(
                        jnp.shape(x), jnp.result_type(x)
                    ),
                    template,
                ),
            )
            state = state.replace(
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=int(restored["step"]),
            )
            start_epoch = resume_epoch - epoch_offset  # global -> local
            # advance the data-key stream past the consumed LOCAL epochs
            # (one split per train batch + one per val batch, mirroring
            # the epoch loop; each stage's key stream restarts from the
            # offset-folded key) so the resumed run sees the batches an
            # uninterrupted run would have seen
            for _ in range(
                start_epoch * (config.batches_per_epoch + config.val_batches)
            ):
                key, _ = jax.random.split(key)
    train_step = make_train_step(network, config)
    eval_step = make_eval_step(network, config)

    history = {"train": [], "val": []}
    num_epochs = epochs if epochs is not None else config.epochs
    for epoch in range(start_epoch, num_epochs):
        start = time.time()
        train_metrics = []
        for _ in range(config.batches_per_epoch):
            key, step_key = jax.random.split(key)
            state, metrics = train_step(state, step_key)
            train_metrics.append(metrics)
        train_avg = {
            k: float(jnp.mean(jnp.stack([m[k] for m in train_metrics])))
            for k in train_metrics[0]
        }
        val_metrics = []
        for _ in range(config.val_batches):
            key, step_key = jax.random.split(key)
            val_metrics.append(eval_step(state, step_key))
        val_avg = {
            k: float(jnp.mean(jnp.stack([m[k] for m in val_metrics])))
            for k in val_metrics[0]
        }
        train_avg["epoch_seconds"] = time.time() - start
        history["train"].append(train_avg)
        history["val"].append(val_avg)
        if log_fn is not None:
            log_fn("train", epoch + epoch_offset, train_avg)
            log_fn("val", epoch + epoch_offset, val_avg)
        if checkpoint_dir is not None and (
            (epoch + 1) % checkpoint_every == 0 or epoch + 1 == num_epochs
        ):
            from .checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_dir,
                epoch + 1 + epoch_offset,  # global epoch across stages
                {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                },
            )
    return state, history


def fit_fov_curriculum(
    config: CalibrationExperiment,
    stages: Tuple[Tuple[float, float, int], ...] = (
        (50.0, 80.0, None),
        (35.0, 105.0, None),
        (30.0, 120.0, None),
    ),
    *,
    log_fn: Callable[[str, int, Dict[str, float]], None] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 25,
) -> Tuple[TrainState, Dict[str, list]]:
    """Train with a narrow-to-wide FOV curriculum (ROADMAP round-2 item).

    Each stage is ``(fov_min_deg, fov_max_deg, epochs)``; ``None`` epochs
    splits ``config.epochs`` evenly across such stages.  One optimiser/LR
    schedule spans the whole run (the schedule is built from
    ``config.epochs``); only the scene distribution changes per stage, at
    the cost of one train-step recompile each.

    ``checkpoint_dir`` forwards to :func:`fit` for periodic full-state
    saves (a killed run loses at most ``checkpoint_every`` epochs), and
    enables cross-stage auto-resume: checkpoint steps are global epochs,
    so a restarted run skips fully-completed stages, resumes the
    interrupted stage from its latest checkpoint (``fit`` maps the
    global epoch back to a stage-local one via ``epoch_offset``), and
    continues through the remaining stages.
    """
    remaining = config.epochs - sum(e for _, _, e in stages if e)
    flexible = [i for i, (_, _, e) in enumerate(stages) if not e]
    per_flex = max(remaining // max(len(flexible), 1), 0)
    resolved_epochs = []
    for i, (_, _, stage_epochs) in enumerate(stages):
        if stage_epochs is None:
            stage_epochs = per_flex + (
                remaining - per_flex * len(flexible)
                if i == flexible[-1]
                else 0
            )
        resolved_epochs.append(stage_epochs)

    resume_global = None
    if checkpoint_dir is not None:
        from .checkpoint import latest_step

        resume_global = latest_step(checkpoint_dir)

    state = None
    history = {"train": [], "val": []}
    offset = 0
    for i, (lo, hi, _) in enumerate(stages):
        stage_epochs = resolved_epochs[i]
        if (
            resume_global is not None
            and resume_global >= offset + stage_epochs
            and i < len(stages) - 1
        ):
            # (the last stage is never skipped: a fully-complete run
            # resumes it with zero remaining epochs, which restores and
            # returns the final checkpointed state)
            # stage fully covered by the checkpoint: skip it. `state`
            # stays None so the resumed stage's fit() restores from the
            # checkpoint directory (initial_state=None path).
            offset += stage_epochs
            continue
        scene = dataclasses.replace(
            config.resolved_scene(), fov_min_degrees=lo, fov_max_degrees=hi
        )
        stage_cfg = dataclasses.replace(config, scene=scene)
        state, h = fit(
            stage_cfg,
            epochs=stage_epochs,
            log_fn=log_fn,
            initial_state=state,
            epoch_offset=offset,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every,
        )
        history["train"].extend(h["train"])
        history["val"].extend(h["val"])
        offset += stage_epochs
    return state, history
