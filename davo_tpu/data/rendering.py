"""On-device synthetic image rendering for the visual front-end.

Closes the observation gap between the oracle-match pipeline and the
project's name-giving capability: the reference's design intent is a conv
feature detector (``networks/modules/feature_detection_module.py:66-88``)
feeding an attention matcher (``feature_match_module.py:34-39``) whose
regressed coordinates replace oracle matches.  The reference ships no
image data source at all (its dataset emits oracle projections only,
``data/camera_and_parameters_dataset.py:153-201``), so training that
front-end needs images whose ground-truth correspondences are known — this
module renders them directly from the synthetic scenes' projections,
entirely on-device (jit + vmap; no host in the loop).

Each world point carries a random *appearance vector* (fixed per scene /
sequence) decoded into a localised pattern: an anisotropic Gaussian blob
with a per-point RGB colour and a radial cosine ripple.  Appearance is
what makes matching learnable: two views of the same point render the
same pattern at different image locations.  A low-frequency background
plus pixel noise stop the detector from keying on "any non-zero pixel".
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = [
    "RenderConfig",
    "sample_appearance",
    "render_frame",
    "render_views",
]

# appearance vector layout (per point):
#   [0:3]  colour direction (normalised to unit RGB intensity)
#   [3]    log-scale of the blob radius
#   [4]    orientation angle theta
#   [5]    eccentricity in [0, 1)
#   [6]    ripple frequency
#   [7]    ripple phase
APPEARANCE_DIM = 8


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Rendering hyper-parameters.

    Images cover the pixel domain ``[-1, 1]^2`` (the projection
    convention of the synthetic generators; visibility == inside this
    square).
    """

    image_size: int = 64
    channels: int = 3
    base_sigma: float = 0.045  # blob radius in [-1, 1] units
    scale_spread: float = 0.35  # log-scale std of per-point radii
    max_eccentricity: float = 0.7
    ripple_strength: float = 0.6
    background_cells: int = 4  # low-frequency background resolution
    background_strength: float = 0.15
    noise_std: float = 0.02
    dtype: jnp.dtype = jnp.float32


def sample_appearance(
    key: jax.Array, num_points: int, config: RenderConfig
) -> jax.Array:
    """``(N, APPEARANCE_DIM)`` random per-point appearance vectors."""
    k_col, k_scale, k_theta, k_ecc, k_freq, k_phase = jax.random.split(key, 6)
    dtype = config.dtype
    colour = jax.random.uniform(
        k_col, (num_points, 3), dtype, 0.25, 1.0
    )
    colour = colour / jnp.linalg.norm(colour, axis=-1, keepdims=True)
    log_scale = config.scale_spread * jax.random.normal(
        k_scale, (num_points, 1), dtype
    )
    theta = jax.random.uniform(
        k_theta, (num_points, 1), dtype, 0.0, jnp.pi
    )
    ecc = jax.random.uniform(
        k_ecc, (num_points, 1), dtype, 0.0, config.max_eccentricity
    )
    freq = jax.random.uniform(k_freq, (num_points, 1), dtype, 2.0, 5.0)
    phase = jax.random.uniform(
        k_phase, (num_points, 1), dtype, 0.0, 2.0 * jnp.pi
    )
    return jnp.concatenate(
        [colour, log_scale, theta, ecc, freq, phase], axis=-1
    )


def _pixel_grid(config: RenderConfig):
    """``(H, W)`` u/v coordinate grids over ``[-1, 1]^2`` (pixel centres)."""
    s = config.image_size
    # pixel centres: avoid placing samples exactly on the domain edge
    coords = (jnp.arange(s, dtype=config.dtype) + 0.5) / s * 2.0 - 1.0
    vv, uu = jnp.meshgrid(coords, coords, indexing="ij")
    return uu, vv


def render_frame(
    projections: jax.Array,
    visibility: jax.Array,
    appearance: jax.Array,
    config: RenderConfig,
    key: jax.Array | None = None,
) -> jax.Array:
    """Render one view: each visible point becomes its appearance pattern
    at its projected location.

    :param projections: ``(N, 2)`` pixel coordinates in ``[-1, 1]``
        (out-of-bounds points simply render outside the image).
    :param visibility: ``(N,)`` bool/float — invisible points render
        nothing (e.g. behind the camera).
    :param appearance: ``(N, APPEARANCE_DIM)`` from
        :func:`sample_appearance` (shared across views of one scene).
    :param key: optional — adds the background + pixel noise.
    :return: ``(H, W, channels)`` image in the config dtype.
    """
    dtype = config.dtype
    uu, vv = _pixel_grid(config)  # (H, W)
    du = uu[:, :, None] - projections[None, None, :, 0]  # (H, W, N)
    dv = vv[:, :, None] - projections[None, None, :, 1]

    colour = appearance[:, 0:3]  # (N, 3)
    sigma = config.base_sigma * jnp.exp(appearance[:, 3])  # (N,)
    theta = appearance[:, 4]
    ecc = appearance[:, 5]
    freq = appearance[:, 6]
    phase = appearance[:, 7]

    # rotate offsets into the blob's principal frame; squash the minor axis
    ct, st = jnp.cos(theta), jnp.sin(theta)
    major = du * ct + dv * st  # (H, W, N)
    minor = -du * st + dv * ct
    inv_minor_sq = 1.0 / jnp.square(1.0 - ecc)  # (N,)
    r_sq = (jnp.square(major) + jnp.square(minor) * inv_minor_sq) / jnp.square(
        sigma
    )
    envelope = jnp.exp(-0.5 * r_sq)  # (H, W, N)
    ripple = 1.0 + config.ripple_strength * jnp.cos(
        freq * jnp.sqrt(r_sq + 1e-12) + phase
    )
    intensity = envelope * ripple * visibility.astype(dtype)  # (H, W, N)
    image = jnp.einsum("hwn,nc->hwc", intensity, colour)
    if config.channels != 3:
        image = jnp.broadcast_to(
            jnp.mean(image, axis=-1, keepdims=True),
            image.shape[:2] + (config.channels,),
        )

    if key is not None:
        k_bg, k_noise = jax.random.split(key)
        cells = config.background_cells
        bg = jax.random.uniform(
            k_bg, (cells, cells, config.channels), dtype
        )
        bg = jax.image.resize(
            bg,
            (config.image_size, config.image_size, config.channels),
            method="bilinear",
        )
        image = image + config.background_strength * bg
        image = image + config.noise_std * jax.random.normal(
            k_noise, image.shape, dtype
        )
    return image


def render_views(
    projections: jax.Array,
    visibility: jax.Array,
    appearance: jax.Array,
    config: RenderConfig,
    key: jax.Array | None = None,
) -> jax.Array:
    """Render a stack of views of one scene (shared appearance).

    :param projections: ``(M, N, 2)``; :param visibility: ``(M, N)``.
    :return: ``(M, H, W, channels)``.
    """
    if key is None:
        return render_views_nokey(projections, visibility, appearance, config)
    keys = jax.random.split(key, projections.shape[0])
    return jax.vmap(
        lambda p, v, k: render_frame(p, v, appearance, config, k)
    )(projections, visibility, keys)


def render_views_nokey(
    projections: jax.Array,
    visibility: jax.Array,
    appearance: jax.Array,
    config: RenderConfig,
) -> jax.Array:
    """:func:`render_views` without background/noise (deterministic)."""
    return jax.vmap(
        lambda p, v: render_frame(p, v, appearance, config, None)
    )(projections, visibility)
