"""Learned solvers: neural networks that replace the BFGS update rule.

Each step mimics one BFGS iteration: a network picks a search direction
from the current (normalised) parameters and error, the objective is
probed at the candidate, and a second network picks a step scale (which
can gate the step off entirely).  Feature parity targets:
``solvers/mlp_solver.py``, ``solvers/transformer_solver.py`` and
``solvers/search_direction_heuristic.py`` in the reference (their
``RecurrentMLPSolver``/``RecurrentTransformerSolver`` call an undefined
attribute — SURVEY.md §2.9 — fixed here by construction).

All solvers are functional: they receive a flat ``(B, E, P)`` parameter
tensor and a batched ``error_fn`` and return refined parameters, so any
objective (calibration, BA) plugs in.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "MLPSolverStep",
    "MLPSolver",
    "TransformerSolverStep",
    "TransformerSolver",
    "SearchDirectionHeuristic",
]


def _normalise(params: jax.Array, axis: int = -1):
    mean = jnp.mean(params, axis=axis, keepdims=True)
    std = jnp.maximum(jnp.std(params, axis=axis, keepdims=True), 1e-8)
    return (params - mean) / std, mean, std


def _error_features(error: jax.Array) -> jax.Array:
    """Bounded error features ``[log1p(e), 1/(1+e)]``.

    The reference feeds the raw error and ``1/clamp(error, 1e-8)`` into its
    networks (``mlp_solver.py:115-120``); unbounded errors saturate the
    GELU step gate to an exact dead zero at init (zero gradient to every
    weight), so the TPU build uses compressed features instead.
    """
    safe = jnp.maximum(error, 0.0)
    return jnp.concatenate(
        [jnp.log1p(safe), 1.0 / (1.0 + safe)], axis=-1
    )


class MLPSolverStep(nn.Module):
    """One learned solver iteration (reference ``MLPSolverStep``,
    ``solvers/mlp_solver.py:72-141``)."""

    num_parameters: int
    search_direction_hidden: int
    line_search_hidden: int

    def _mlp(self, x, hidden, out, prefix, training):
        x = nn.Dense(hidden, name=f"{prefix}_dense_1")(x)
        x = nn.gelu(x)
        x = nn.BatchNorm(
            use_running_average=not training, name=f"{prefix}_norm_1"
        )(x)
        x = nn.Dense(hidden, name=f"{prefix}_dense_2")(x)
        x = nn.gelu(x)
        x = nn.BatchNorm(
            use_running_average=not training, name=f"{prefix}_norm_2"
        )(x)
        return nn.Dense(out, name=f"{prefix}_head")(x)

    @nn.compact
    def __call__(
        self,
        parameters: jax.Array,
        error_fn: Callable[[jax.Array], jax.Array],
        *,
        training: bool = False,
    ) -> jax.Array:
        """
        :param parameters: ``(B, E, P)``.
        :param error_fn: ``(B, E, P) -> (B, E)``.
        """
        normed, mean, std = _normalise(parameters)
        error = error_fn(parameters)[..., None]
        inputs = jnp.concatenate([normed, _error_features(error)], axis=-1)
        direction = self._mlp(
            inputs,
            self.search_direction_hidden,
            self.num_parameters,
            "search_direction",
            training,
        )
        # Rescale the direction to the parameter scale (the reference also
        # adds the mean — a bias that shifts the *direction* toward the
        # parameter mean, dropped here).
        direction = direction * std
        candidate = parameters + direction
        cand_normed, _, _ = _normalise(candidate)
        cand_error = error_fn(candidate)[..., None]
        line_inputs = jnp.concatenate(
            [inputs, cand_normed, _error_features(cand_error)], axis=-1
        )
        scale = self._mlp(
            line_inputs, self.line_search_hidden, 1, "line_search", training
        )
        scale = nn.gelu(scale)  # gating: the step can be turned off
        return parameters + scale * direction


class MLPSolver(nn.Module):
    """A fixed number of learned steps; ``recurrent=True`` shares one set
    of weights across steps (reference ``MLPSolver`` /
    ``RecurrentMLPSolver``)."""

    num_steps: int
    num_parameters: int
    search_direction_hidden: int
    line_search_hidden: int
    recurrent: bool = False

    @nn.compact
    def __call__(
        self,
        parameters: jax.Array,
        error_fn: Callable[[jax.Array], jax.Array],
        *,
        training: bool = False,
        return_trajectory: bool = False,
    ) -> jax.Array:
        trajectory = []
        if self.recurrent:
            step = MLPSolverStep(
                self.num_parameters,
                self.search_direction_hidden,
                self.line_search_hidden,
                name="solver_step",
            )
            for _ in range(self.num_steps):
                parameters = step(parameters, error_fn, training=training)
                trajectory.append(parameters)
        else:
            for i in range(self.num_steps):
                parameters = MLPSolverStep(
                    self.num_parameters,
                    self.search_direction_hidden,
                    self.line_search_hidden,
                    name=f"solver_step_{i}",
                )(parameters, error_fn, training=training)
                trajectory.append(parameters)
        if return_trajectory:
            return jnp.stack(trajectory)  # (num_steps, B, E, P)
        return parameters


class _EncoderBlock(nn.Module):
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, tokens):
        attn = nn.SelfAttention(
            num_heads=self.num_heads, deterministic=True, name="attn"
        )(nn.LayerNorm(name="ln_a")(tokens))
        tokens = tokens + attn
        x = nn.LayerNorm(name="ln_m")(tokens)
        x = nn.Dense(4 * self.embed_dim, name="mlp_in")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.embed_dim, name="mlp_out")(x)
        return tokens + x


class TransformerSolverStep(nn.Module):
    """One transformer solver iteration over the estimates sequence.

    The E parallel estimates form the sequence; an accumulated history of
    past (parameters, error) rows lengthens the sequence each step
    (reference ``solvers/transformer_solver.py:80-162``).
    """

    num_parameters: int
    embed_dim: int
    num_heads: int = 4
    search_direction_layers: int = 2
    line_search_layers: int = 2

    def _encode(self, rows, prefix, layers):
        x = nn.Dense(self.embed_dim, name=f"{prefix}_embed")(rows)
        for i in range(layers):
            x = _EncoderBlock(
                self.embed_dim, self.num_heads, name=f"{prefix}_block_{i}"
            )(x)
        return x

    @nn.compact
    def __call__(
        self,
        parameters: jax.Array,
        error_fn: Callable[[jax.Array], jax.Array],
        history: Optional[jax.Array] = None,
        *,
        training: bool = False,
    ):
        """
        :param parameters: ``(B, E, P)``.
        :param history: ``(B, S*E, P+2)`` accumulated rows or ``None``.
        :return: ``(new_parameters, new_history)``.
        """
        num_estimates = parameters.shape[-2]
        normed, mean, std = _normalise(parameters)
        error = error_fn(parameters)[..., None]
        rows = jnp.concatenate([normed, _error_features(error)], axis=-1)
        if history is not None:
            sequence = jnp.concatenate([rows, history], axis=-2)
        else:
            sequence = rows
        direction_tokens = self._encode(
            sequence, "search_direction", self.search_direction_layers
        )
        direction = nn.Dense(self.num_parameters, name="direction_head")(
            direction_tokens[..., :num_estimates, :]
        )
        direction = direction * std
        candidate = parameters + direction
        cand_normed, _, _ = _normalise(candidate)
        cand_error = error_fn(candidate)[..., None]
        cand_rows = jnp.concatenate(
            [cand_normed, _error_features(cand_error)], axis=-1
        )
        line_tokens = self._encode(
            jnp.concatenate([cand_rows, sequence], axis=-2),
            "line_search",
            self.line_search_layers,
        )
        scale = nn.Dense(1, name="scale_head")(
            line_tokens[..., :num_estimates, :]
        )
        scale = nn.gelu(scale)
        return parameters + scale * direction, sequence


class TransformerSolver(nn.Module):
    """Fixed-step transformer solver with growing estimate history
    (reference ``TransformerSolver`` / ``RecurrentTransformerSolver``)."""

    num_steps: int
    num_parameters: int
    embed_dim: int
    num_heads: int = 4
    search_direction_layers: int = 2
    line_search_layers: int = 2
    recurrent: bool = False

    @nn.compact
    def __call__(
        self,
        parameters: jax.Array,
        error_fn: Callable[[jax.Array], jax.Array],
        *,
        training: bool = False,
        return_trajectory: bool = False,
    ) -> jax.Array:
        def make_step(name):
            return TransformerSolverStep(
                self.num_parameters,
                self.embed_dim,
                self.num_heads,
                self.search_direction_layers,
                self.line_search_layers,
                name=name,
            )

        history = None
        trajectory = []
        if self.recurrent:
            step = make_step("solver_step")
            for _ in range(self.num_steps):
                parameters, history = step(
                    parameters, error_fn, history, training=training
                )
                trajectory.append(parameters)
        else:
            for i in range(self.num_steps):
                parameters, history = make_step(f"solver_step_{i}")(
                    parameters, error_fn, history, training=training
                )
                trajectory.append(parameters)
        if return_trajectory:
            return jnp.stack(trajectory)
        return parameters


class SearchDirectionHeuristic(nn.Module):
    """Sigmoid-gates search-direction components given the direction and
    the step number (reference ``search_direction_heuristic.py:5-39``);
    pluggable as ``direction_fn`` into :func:`davo_tpu.solve.bfgs_solve`."""

    num_parameters: int
    hidden_size: int = -1

    @nn.compact
    def __call__(
        self,
        search_direction: jax.Array,
        step_number: jax.Array,
        *,
        training: bool = False,
    ) -> jax.Array:
        hidden = (
            self.hidden_size if self.hidden_size > 0 else 3 * self.num_parameters
        )
        step = jnp.broadcast_to(
            jnp.asarray(step_number, dtype=search_direction.dtype),
            search_direction.shape[:-1] + (1,),
        )
        x = jnp.concatenate([search_direction, step], axis=-1)
        x = nn.Dense(hidden, name="dense_1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not training, name="norm")(x)
        x = nn.Dense(self.num_parameters, name="dense_2")(x)
        gate = nn.sigmoid(x)
        return search_direction * gate
