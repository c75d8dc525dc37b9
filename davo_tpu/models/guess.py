"""Initial-guess networks for the gauge-fixed pinhole BA objective.

Each guess module maps observed pixel matches to ``PinholeBAParams`` with
an estimates dimension E (multi-start hypotheses).  Feature parity targets
in the reference repo: ``initial_guess/base_pinhole_camera_model_guess.py``
(vector unpacking, ``:71-119``), ``pinhole_camera_model_mlp_guess.py``,
``pinhole_camera_model_transformer_guess.py`` (with its WIP positional
encoding replaced by a working learned encoding), and
``simple_camera_model_fixed_guess.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from davo_tpu.camera import PinholeBAParams

__all__ = [
    "num_guess_parameters",
    "guess_vector_to_params",
    "PinholeMLPGuess",
    "PinholeTransformerGuess",
    "PinholeFixedGuess",
]


def num_guess_parameters(num_views: int, num_points: int) -> int:
    """Guess-head output size: ``3 + 6M + 2(N-2) + (N-3)``
    (reference ``:38-41``)."""
    return 3 + 6 * num_views + 2 * (num_points - 2) + (num_points - 3)


def guess_vector_to_params(
    x: jax.Array, num_views: int, num_points: int
) -> PinholeBAParams:
    """Unpack a guess-head output vector into BA parameters.

    Layout (reference ``_build_model_from_vector``, ``:71-119``):
    ``[f, cx, cy, orientation(3M), translation(3M), z(N-3), xy(2(N-2))]``.
    The first free world point's z is gauge-fixed to 0.

    :param x: ``(..., G)`` guess vectors.
    :return: parameters with the same leading batch dims.
    """
    m, n = num_views, num_points
    expected = num_guess_parameters(m, n)
    if x.shape[-1] != expected:
        raise ValueError(
            f"Guess vector must have {expected} entries for M={m}, N={n}; "
            f"got {x.shape[-1]}"
        )
    batch = x.shape[:-1]
    o_end = 3 + 3 * m
    t_end = o_end + 3 * m
    z_end = t_end + (n - 3)
    orientation = x[..., 3:o_end].reshape(batch + (m, 3))
    translation = x[..., o_end:t_end].reshape(batch + (m, 3))
    z = jnp.concatenate(
        [jnp.zeros(batch + (1,), dtype=x.dtype), x[..., t_end:z_end]], axis=-1
    )
    xy = x[..., z_end:].reshape(batch + (n - 2, 2))
    world_points = jnp.concatenate([xy, z[..., None]], axis=-1)
    return PinholeBAParams(
        focal_length=x[..., 0],
        cx=x[..., 1],
        cy=x[..., 2],
        translation=translation,
        orientation=orientation,
        world_points=world_points,
    )


class PinholeMLPGuess(nn.Module):
    """Linear/GELU/BatchNorm/Linear guess head producing one estimate
    (reference ``pinhole_camera_model_mlp_guess.py:38-51``)."""

    num_views: int
    num_points: int
    num_hidden: int = -1

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
    ) -> PinholeBAParams:
        del visibility_mask
        hidden = (
            self.num_hidden
            if self.num_hidden > 0
            else 8 * self.num_views * self.num_points
        )
        batch = projected_points.shape[0]
        x = projected_points.reshape(batch, -1)
        x = nn.Dense(hidden, name="dense_1")(x)
        x = nn.gelu(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            use_bias=False,
            use_scale=False,
            name="norm",
        )(x)
        x = nn.Dense(
            num_guess_parameters(self.num_views, self.num_points), name="head"
        )(x)
        # one estimate: E = 1
        return guess_vector_to_params(
            x[:, None, :], self.num_views, self.num_points
        )


class PinholeTransformerGuess(nn.Module):
    """Transformer guess head emitting E parallel estimates.

    Pixels are embedded by a fixed random-orthonormal 2 -> D projection,
    combined with learned per-view and per-point positional embeddings, run
    through a Transformer encoder; the first ``num_estimates`` output
    tokens become the E hypotheses (reference
    ``pinhole_camera_model_transformer_guess.py:54-100``; its ``torch.sin()``
    positional-encoding bug is replaced by learned embeddings).
    """

    num_views: int
    num_points: int
    num_estimates: int = 4
    embed_dim: int = 64
    num_layers: int = 2
    num_heads: int = 4

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
    ) -> PinholeBAParams:
        b = projected_points.shape[0]
        m, n, d = self.num_views, self.num_points, self.embed_dim
        # Fixed random-orthonormal pixel embedding (not trained); computed
        # inline from a constant key rather than stored in a variable
        # collection, so checkpoints carrying only params/batch_stats work.
        pixel_proj = jnp.linalg.qr(
            jax.random.normal(jax.random.key(0), (d, d))
        )[0][:, :2]
        tokens = jnp.einsum(
            "bmnc,dc->bmnd", projected_points, pixel_proj
        )
        view_embed = self.param(
            "view_embedding", nn.initializers.normal(0.02), (m, 1, d)
        )
        point_embed = self.param(
            "point_embedding", nn.initializers.normal(0.02), (1, n, d)
        )
        tokens = tokens + view_embed + point_embed
        vis = visibility_mask.astype(tokens.dtype).reshape(b, m, n, 1)
        tokens = tokens * vis
        tokens = tokens.reshape(b, m * n, d)
        estimate_tokens = self.param(
            "estimate_tokens",
            nn.initializers.normal(0.02),
            (self.num_estimates, d),
        )
        tokens = jnp.concatenate(
            [jnp.broadcast_to(estimate_tokens, (b,) + estimate_tokens.shape), tokens],
            axis=1,
        )
        for i in range(self.num_layers):
            attn = nn.SelfAttention(
                num_heads=self.num_heads, name=f"attn_{i}", deterministic=True
            )(nn.LayerNorm(name=f"ln_a_{i}")(tokens))
            tokens = tokens + attn
            mlp_in = nn.LayerNorm(name=f"ln_m_{i}")(tokens)
            mlp = nn.Dense(4 * d, name=f"mlp_in_{i}")(mlp_in)
            mlp = nn.gelu(mlp)
            mlp = nn.Dense(d, name=f"mlp_out_{i}")(mlp)
            tokens = tokens + mlp
        heads = tokens[:, : self.num_estimates, :]
        x = nn.Dense(num_guess_parameters(m, n), name="head")(heads)
        return guess_vector_to_params(x, m, n)


class PinholeFixedGuess(nn.Module):
    """A learnable-constant guess (the "fixed" baseline): one set of
    parameters shared by every batch element (reference
    ``simple_camera_model_fixed_guess.py``: f/c/orientation/translation
    with z=20 start/points as nn.Parameters tiled over the batch)."""

    num_views: int
    num_points: int
    initial_distance: float = 20.0

    @nn.compact
    def __call__(
        self,
        projected_points: jax.Array,
        visibility_mask: jax.Array,
        *,
        training: bool = False,
    ) -> PinholeBAParams:
        del visibility_mask
        b = projected_points.shape[0]
        m, n = self.num_views, self.num_points
        focal = self.param("focal_length", nn.initializers.ones_init(), (1,))
        centre = self.param("centre", nn.initializers.zeros_init(), (2,))
        orientation = self.param(
            "orientation", nn.initializers.normal(1e-2), (m, 3)
        )
        translation_init = jnp.tile(
            jnp.asarray([0.0, 0.0, self.initial_distance]), (m, 1)
        )
        translation = self.param(
            "translation", lambda key, shape: translation_init, (m, 3)
        )
        points_init = jnp.concatenate(
            [
                jnp.zeros((n - 2, 2)),
                jnp.full((n - 2, 1), self.initial_distance),
            ],
            axis=-1,
        )
        world_points = self.param(
            "world_points", lambda key, shape: points_init, (n - 2, 3)
        )
        tile = lambda x: jnp.broadcast_to(x, (b, 1) + x.shape)
        return PinholeBAParams(
            focal_length=jnp.broadcast_to(focal[0], (b, 1)),
            cx=jnp.broadcast_to(centre[0], (b, 1)),
            cy=jnp.broadcast_to(centre[1], (b, 1)),
            translation=tile(translation),
            orientation=tile(orientation),
            world_points=tile(world_points),
        )
