"""End-to-end calibration network: MLP initial guess + in-forward BFGS.

The flagship gen-2 model: a 3-layer MLP maps the flattened M x N x 2 match
coordinates to an initial calibration parameter vector, then a batched BFGS
solve over the projective-angle reprojection error refines it *inside the
forward pass* — the solve is part of the network.

Feature parity target: ``networks/calibration_network.py`` in the reference
(solver defaults ``error_threshold=1e-7, training_error_threshold=1e-3``,
``:44``).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from davo_tpu.camera import (
    BasinScoreConfig,
    basin_score,
    calibration_error,
    num_calibration_parameters,
)
from davo_tpu.ops.calibration_obj import make_fused_calibration_objective
from davo_tpu.solve import BFGSConfig, LBFGSConfig, bfgs_solve, lbfgs_solve

__all__ = [
    "CalibrationNetwork",
    "CalibrationMLPHead",
    "CalibrationTransformerHead",
]


class CalibrationMLPHead(nn.Module):
    """Linear/GELU/BatchNorm x2 + linear head (reference ``:35-43``)."""

    num_outputs: int
    hidden_size: int

    @nn.compact
    def __call__(self, inputs: jax.Array, *, training: bool = False) -> jax.Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not training, name=name
        )
        x = nn.Dense(self.hidden_size, name="dense_1")(inputs)
        x = nn.gelu(x)
        x = norm("norm_1")(x)
        x = nn.Dense(self.hidden_size, name="dense_2")(x)
        x = nn.gelu(x)
        x = norm("norm_2")(x)
        return nn.Dense(self.num_outputs, name="head")(x)


class CalibrationTransformerHead(nn.Module):
    """Attention guess head: one token per (view, point) observation with
    learned view/point embeddings and a visibility gate, pre-LN encoder
    blocks, and readout token(s) regressing the parameter vector.

    A per-observation tokenisation respects the problem's structure (the
    flattened-MLP head must rediscover which inputs share a point/view);
    flash attention serves the blocks on TPU for large M*N.

    With ``num_tokens > 1``, the first E output tokens become E parallel
    estimates — the reference's transformer-guess idea
    (``initial_guess/pinhole_camera_model_transformer_guess.py:89-100``),
    here trained with a winner-take-all loss so the tokens specialise
    into diverse restart proposals (see ``train/calibration.py``).
    """

    num_outputs: int
    num_views: int
    num_points: int
    embed_dim: int = 128
    num_layers: int = 3
    num_heads: int = 4
    num_tokens: int = 1

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
    ) -> jax.Array:
        """:return: ``(B, P)``, or ``(B, E, P)`` when ``num_tokens > 1``."""
        b = projected_points.shape[0]
        m, n, d = self.num_views, self.num_points, self.embed_dim
        e = self.num_tokens
        tokens = nn.Dense(d, name="pixel_embed")(projected_points)  # (B,M,N,d)
        view_embed = self.param(
            "view_embedding", nn.initializers.normal(0.02), (m, 1, d)
        )
        point_embed = self.param(
            "point_embedding", nn.initializers.normal(0.02), (1, n, d)
        )
        vis = visibility_mask.astype(tokens.dtype)[..., None]
        tokens = (tokens + view_embed + point_embed) * vis
        tokens = tokens.reshape(b, m * n, d)
        readout = self.param(
            "readout_token", nn.initializers.normal(0.02), (e, d)
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(readout, (b,) + readout.shape), tokens], axis=1
        )
        for i in range(self.num_layers):
            attn = nn.SelfAttention(
                num_heads=self.num_heads,
                deterministic=True,
                name=f"attn_{i}",
            )(nn.LayerNorm(name=f"ln_a_{i}")(tokens))
            tokens = tokens + attn
            x = nn.LayerNorm(name=f"ln_m_{i}")(tokens)
            x = nn.Dense(4 * d, name=f"mlp_in_{i}")(x)
            x = nn.gelu(x)
            x = nn.Dense(d, name=f"mlp_out_{i}")(x)
            tokens = tokens + x
        pooled = nn.LayerNorm(name="ln_out")(tokens[:, 0:e])
        out = nn.Dense(self.num_outputs, name="head")(pooled)  # (B, E, P)
        return out[:, 0] if e == 1 else out


def permutation_restart_guesses(
    apply_head,
    pixels: jax.Array,
    visibility: jax.Array,
    raw_guess: jax.Array,
    num_points: int,
    key: jax.Array,
    restarts: int,
) -> jax.Array:
    """Multi-start guesses from point-permuted applications of the head.

    The guess heads are point-order-sensitive (positional encodings /
    flattened inputs), so applying them to a permuted copy of the same
    scene yields a different — but still scene-informed — estimate.  The
    predicted world-point slices come back in permuted order; they are
    scattered back through the inverse permutation so every start
    describes the points in the original order.  Intrinsics and poses are
    order-free and pass through unchanged.

    :param apply_head: ``(pixels (B,M,N,2), vis (B,M,N)) -> (B, P)``.
    :param raw_guess: ``(B, P)`` head output on the unpermuted scene
        (becomes restart 0).
    :return: ``(B, restarts, P)`` starts.
    """
    guesses = [raw_guess]
    points_end = 3 + 3 * num_points
    for e in range(1, restarts):
        perm = jax.random.permutation(
            jax.random.fold_in(key, e), num_points
        )
        guess = apply_head(pixels[:, :, perm, :], visibility[:, :, perm])
        # entry j of the permuted prediction is original point perm[j]
        inverse = jnp.argsort(perm)
        points = guess[:, 3:points_end].reshape(-1, num_points, 3)[
            :, inverse
        ]
        guesses.append(
            jnp.concatenate(
                [
                    guess[:, :3],
                    points.reshape(-1, 3 * num_points),
                    guess[:, points_end:],
                ],
                axis=-1,
            )
        )
    return jnp.stack(guesses, axis=1)


class CalibrationNetwork(nn.Module):
    """MLP guess + differentiable BFGS refinement.

    :param num_views: M views per problem.
    :param num_points: N tracked points per problem.
    :param hidden_size: MLP width; ``<= 0`` means ``4 * num_inputs``
        (reference default, ``:33-34``).
    :param solver: configuration for the in-forward solve — a
        :class:`BFGSConfig` (reference behaviour) or :class:`LBFGSConfig`
        (limited-memory variant, no dense inverse-Hessian carry).
    """

    num_views: int
    num_points: int
    hidden_size: int = -1
    solver: Union[BFGSConfig, LBFGSConfig] = BFGSConfig(
        error_threshold=1e-7, training_error_threshold=1e-3
    )
    # Multi-start refinement at inference: solve from this many perturbed
    # copies of the guess (the gen-1 stack's E parallel-estimates idea
    # applied to the gen-2 network) and keep the lowest-scoring estimate.
    num_restarts: int = 1
    restart_noise: float = 0.1
    # How the extra multi-start guesses are proposed:
    # "noise"       — Gaussian perturbations of the raw guess (default);
    # "permutation" — re-apply the guess head to point-permuted copies of
    #                 the scene and un-permute the world-point slices.
    #                 The heads are point-order-sensitive (positional
    #                 encodings / flattened MLP input), so permutations
    #                 yield diverse yet *informed* starts, unlike blind
    #                 noise.  Restart 0 is always the raw guess.
    # "tokens"      — the transformer head's E readout tokens ARE the
    #                 proposals (requires guess_tokens > 1; the head is
    #                 trained winner-take-all so tokens specialise into
    #                 diverse starts).  Extra restarts beyond the token
    #                 count fall back to noise around token 0.
    # "input_noise" — noise-conditioned ensemble: re-apply the head to
    #                 observation-jittered copies of the scene.  The
    #                 head's nonlinearity turns small INPUT noise into
    #                 structured, scene-consistent start diversity,
    #                 where parameter-space noise is isotropic in the
    #                 gauge-fixed coordinates.
    restart_proposals: str = "noise"
    # observation jitter std for restart_proposals="input_noise"
    input_noise: float = 0.02
    # Number of readout tokens of the transformer head (E parallel guess
    # estimates, reference pinhole_camera_model_transformer_guess.py:89-100).
    # With > 1, the TRAINING forward returns the raw (B, E, P) token
    # guesses (no in-training solve — the winner-take-all supervised loss
    # in train/calibration.py consumes all tokens); eval solves whichever
    # restart proposals are configured.
    guess_tokens: int = 1
    # Restart selection criterion: "error" = raw reprojection error (the
    # reference-style choice), "basin" = reprojection error + plausibility
    # penalties (davo_tpu.camera.basin_score) — raw error favours spurious
    # projective basins whose intrinsics are far from truth.
    selection: str = "error"
    basin: BasinScoreConfig = BasinScoreConfig()
    # Guess head: "mlp" (reference architecture) or "transformer"
    # (per-observation tokens + attention).
    head: str = "mlp"
    transformer_layers: int = 3
    transformer_heads: int = 4
    # Fused Pallas objective (ops/calibration_obj.py) for the eval-mode
    # solves: one VMEM pass per value+gradient / line-search probe instead
    # of HBM-materialised autodiff intermediates.  Eval-only (the fused
    # closure's custom_jvp discards higher-order structure, which the
    # training-mode unrolled solve needs).  None auto-enables on TPU; the
    # kernel choice itself is deferred to lowering time, so an explicitly
    # True setting still runs (as an equivalent jnp program) on CPU.
    fused_objective: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        true_projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
        return_error: bool = False,
    ) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
        """
        :param true_projected_points: ``(B, M, N, 2)`` observed pixels.
        :param visibility_mask: ``(B, M, N)`` visibility flags.
        :return: ``(B, P)`` calibration parameters (and the final error per
            element if ``return_error``).
        """
        num_inputs = self.num_views * self.num_points * 2
        num_parameters = num_calibration_parameters(self.num_views, self.num_points)
        hidden = self.hidden_size if self.hidden_size > 0 else 4 * num_inputs

        batch = true_projected_points.shape[0]
        if self.guess_tokens > 1 and self.head != "transformer":
            raise ValueError(
                "guess_tokens > 1 requires the transformer head "
                f"(got head={self.head!r})"
            )
        if self.head == "transformer":
            head_module = CalibrationTransformerHead(
                num_outputs=num_parameters,
                num_views=self.num_views,
                num_points=self.num_points,
                embed_dim=hidden if self.hidden_size > 0 else 128,
                num_layers=self.transformer_layers,
                num_heads=self.transformer_heads,
                num_tokens=self.guess_tokens,
                name="initial_estimator",
            )

            def apply_head(pixels, vis):
                return head_module(pixels, vis, training=training)

        elif self.head == "mlp":
            head_module = CalibrationMLPHead(
                num_outputs=num_parameters,
                hidden_size=hidden,
                name="initial_estimator",
            )

            def apply_head(pixels, vis):
                return head_module(
                    pixels.reshape(batch, num_inputs), training=training
                )

        else:
            raise ValueError(f"Unknown head: {self.head!r}")
        initial_guess = apply_head(true_projected_points, visibility_mask)
        multi_token = self.guess_tokens > 1
        token_guesses = None
        if multi_token:
            token_guesses = initial_guess  # (B, E, P)
            initial_guess = token_guesses[:, 0]

        visibility = visibility_mask.astype(initial_guess.dtype)

        def error_function(parameters: jax.Array) -> jax.Array:
            return calibration_error(
                parameters, true_projected_points, visibility
            )

        def multi_error(parameters):
            return calibration_error(
                parameters,
                true_projected_points[:, None],
                visibility[:, None],
            )

        if training and multi_token:
            # multi-token heads train purely supervised winner-take-all on
            # the raw token guesses (train/calibration.py) — no in-training
            # solve (matching the curriculum recipe's training_iterations=0)
            if return_error:
                return token_guesses, multi_error(token_guesses)
            return token_guesses

        drop_key = None
        if training and self.solver.drop_path_p > 0.0:
            drop_key = self.make_rng("drop_path")
        solve = (
            lbfgs_solve
            if isinstance(self.solver, LBFGSConfig)
            else bfgs_solve
        )
        use_fused_obj = self.fused_objective
        if use_fused_obj is None:
            use_fused_obj = jax.devices()[0].platform == "tpu"
        use_fused_obj = use_fused_obj and not training

        restarts = 1 if training else max(self.num_restarts, 1)
        if restarts > 1:
            # (B, E, P): estimate 0 is the raw guess, the rest perturbed.
            # Pass rngs={"restarts": key} to apply() for independent draws;
            # without one the perturbations are a fixed deterministic set.
            if self.has_rng("restarts"):
                restart_key = self.make_rng("restarts")
            else:
                restart_key = jax.random.key(0)
            if self.restart_proposals == "tokens":
                if not multi_token:
                    raise ValueError(
                        "restart_proposals='tokens' requires guess_tokens > 1"
                    )
                e = min(restarts, self.guess_tokens)
                starts = token_guesses[:, :e]
                if restarts > e:
                    extra = initial_guess[
                        :, None, :
                    ] + self.restart_noise * jax.random.normal(
                        restart_key,
                        (batch, restarts - e, num_parameters),
                        dtype=initial_guess.dtype,
                    )
                    starts = jnp.concatenate([starts, extra], axis=1)
            elif self.restart_proposals == "permutation":
                if multi_token:
                    raise ValueError(
                        "restart_proposals='permutation' is incompatible "
                        "with guess_tokens > 1 (use 'tokens')"
                    )
                starts = permutation_restart_guesses(
                    apply_head,
                    true_projected_points,
                    visibility_mask,
                    initial_guess,
                    self.num_points,
                    restart_key,
                    restarts,
                )
            elif self.restart_proposals == "input_noise":
                guesses = [initial_guess]
                for e in range(1, restarts):
                    jit_pts = (
                        true_projected_points
                        + self.input_noise
                        * jax.random.normal(
                            jax.random.fold_in(restart_key, e),
                            true_projected_points.shape,
                            initial_guess.dtype,
                        )
                    )
                    g = apply_head(jit_pts, visibility_mask)
                    guesses.append(g[:, 0] if multi_token else g)
                starts = jnp.stack(guesses, axis=1)
            elif self.restart_proposals == "noise":
                noise = self.restart_noise * jax.random.normal(
                    restart_key,
                    (batch, restarts - 1, num_parameters),
                    dtype=initial_guess.dtype,
                )
                starts = jnp.concatenate(
                    [
                        initial_guess[:, None, :],
                        initial_guess[:, None, :] + noise,
                    ],
                    axis=1,
                )
            else:
                raise ValueError(
                    f"Unknown restart_proposals: {self.restart_proposals!r}"
                )

            # Solve on the flattened (B*E, P) batch: independent elements,
            # identical numerics, and a 2-D batch lets the fused Pallas
            # Hessian kernel auto-enable on TPU (solve/bfgs.py).  The error
            # callback reshapes back to (B, E, P) so the observations
            # broadcast instead of being replicated E-fold.
            def flat_error(parameters):
                return multi_error(
                    parameters.reshape(batch, restarts, num_parameters)
                ).reshape(batch * restarts)

            if use_fused_obj:
                # The fused closures capture per-element observations, so
                # tile them over the E restarts (tiny: M x N scalars per
                # element) instead of broadcasting inside the callback.
                tiled_pts = jnp.repeat(true_projected_points, restarts, axis=0)
                tiled_vis = jnp.repeat(visibility, restarts, axis=0)
                flat_obj, flat_vg = make_fused_calibration_objective(
                    tiled_pts, tiled_vis
                )
                solved = solve(
                    flat_obj,
                    starts.reshape(batch * restarts, num_parameters),
                    self.solver,
                    training=False,
                    value_and_grad_fn=flat_vg,
                ).reshape(batch, restarts, num_parameters)
            else:
                solved = solve(
                    flat_error,
                    starts.reshape(batch * restarts, num_parameters),
                    self.solver,
                    training=False,
                ).reshape(batch, restarts, num_parameters)
            if self.selection == "basin":
                anchor = None
                if self.basin.anchor_weight > 0.0:
                    # log of the guess head's effective focal (elu(f)+1,
                    # matching pixel_coordinates_to_homogeneous)
                    f_guess = jax.nn.elu(initial_guess[:, 0]) + 1.0
                    anchor = jnp.log(jnp.maximum(f_guess, 1e-6))[:, None]
                scores = basin_score(
                    solved,
                    true_projected_points[:, None],
                    visibility[:, None],
                    self.basin,
                    anchor_log_focal=anchor,
                )
            elif self.selection == "error":
                scores = multi_error(solved)
            else:
                raise ValueError(f"Unknown selection: {self.selection!r}")
            best = jnp.argmin(scores, axis=-1)
            result = jnp.take_along_axis(
                solved, best[:, None, None], axis=1
            )[:, 0]
        elif use_fused_obj:
            # Single-start eval: the fused closures replace the plain
            # objective directly (use_fused_obj already excludes training,
            # whose unrolled solve needs the differentiable jnp path).
            fused_obj, fused_vg = make_fused_calibration_objective(
                true_projected_points, visibility
            )
            result = solve(
                fused_obj,
                initial_guess,
                self.solver,
                training=False,
                value_and_grad_fn=fused_vg,
            )
        else:
            result = solve(
                error_function,
                initial_guess,
                self.solver,
                training=training,
                key=drop_key,
            )
        if return_error:
            return result, error_function(result)
        return result
