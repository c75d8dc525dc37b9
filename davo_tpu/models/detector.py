"""Convolutional feature detector (U-Net) producing per-location feature
coordinates + descriptors.

A working realisation of the reference's design intent
(``networks/modules/feature_detection_module.py``, which is WIP/broken —
Conv3d/BatchNorm2d mismatches, an uncalled bottleneck; see SURVEY.md §2.9):

* the image is augmented with normalised u/v coordinate channels,
* a strided encoder stack downsamples aggressively; the first stage emits
  2 coordinate channels (learned feature positions) + descriptor channels,
* a bottleneck plus skip-connected nearest-neighbour upsampling stages
  recover per-location descriptors,
* output is ``FeaturePoints(points, descriptors)`` with one feature per
  coarse spatial location.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from davo_tpu.types import FeaturePoints

__all__ = ["UpscaleModule", "UpscaleWithSkipModule", "FeatureDetectionModule"]


class UpscaleModule(nn.Module):
    """Nearest-neighbour upsample to a target spatial size + smoothing conv
    (reference ``upscale_module.py``)."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, target_hw) -> jax.Array:
        b, h, w, c = x.shape
        th, tw = target_hw
        x = jax.image.resize(x, (b, th, tw, c), method="nearest")
        return nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            use_bias=False,
            name="smooth",
        )(x)


class UpscaleWithSkipModule(nn.Module):
    """Upscale to the skip's size and add it
    (reference ``upscale_with_skip_module.py``)."""

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array) -> jax.Array:
        up = UpscaleModule(out_channels=skip.shape[-1], name="upscale")(
            x, skip.shape[1:3]
        )
        return up + skip


class _ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 2

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            name="conv",
        )(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not training, name="norm")(x)


class FeatureDetectionModule(nn.Module):
    """U-Net feature detector.

    :param descriptor_channels: channels of the output descriptors.
    :return: ``FeaturePoints`` with ``points`` of shape ``(B, K, 2)``
        (learned coordinates per coarse location) and ``descriptors`` of
        shape ``(B, K, descriptor_channels)``.
    """

    descriptor_channels: int = 64
    # feature coordinates are parametrised as (cell centre + bounded
    # offset): each coarse location predicts an offset of at most this
    # many cell widths — regressing absolute [-1, 1] coordinates from a
    # conv is much harder to learn (the reference's raw 2-channel output
    # never trained; this is the working realisation's choice)
    max_offset_cells: float = 1.5

    @nn.compact
    def __call__(self, image: jax.Array, *, training: bool = False) -> FeaturePoints:
        b, h, w, _ = image.shape
        # coordinate channels, normalised to [-1, 1]
        v = jnp.linspace(-1.0, 1.0, h, dtype=image.dtype)
        u = jnp.linspace(-1.0, 1.0, w, dtype=image.dtype)
        vv, uu = jnp.meshgrid(v, u, indexing="ij")
        coords = jnp.broadcast_to(
            jnp.stack([uu, vv], axis=-1), (b, h, w, 2)
        )
        x = jnp.concatenate([image, coords], axis=-1)

        d = self.descriptor_channels
        # big initial encoder: three stride-2 stages
        x = _ConvBlock(8, kernel=7, name="enc1_a")(x, training=training)
        x = _ConvBlock(16, name="enc1_b")(x, training=training)
        x = _ConvBlock(d + 2, name="enc1_c")(x, training=training)
        points_map = x[..., 0:2]
        skip1 = x[..., 2:]
        skip2 = _ConvBlock(d, name="enc2")(skip1, training=training)
        skip3 = _ConvBlock(d, name="enc3")(skip2, training=training)
        x = _ConvBlock(d, name="enc4")(skip3, training=training)
        x = nn.Conv(d, (3, 3), name="bottleneck")(x)
        x = nn.relu(x)
        x = UpscaleWithSkipModule(name="up1")(x, skip3)
        x = UpscaleWithSkipModule(name="up2")(x, skip2)
        x = UpscaleWithSkipModule(name="up3")(x, skip1)

        # point/score head on the decoder output (+ the encoder's raw
        # coordinate channels, the reference's design intent): 2 offset
        # channels + 1 detection-confidence logit per coarse cell
        hc, wc = x.shape[1], x.shape[2]
        head = nn.Conv(3, (3, 3), name="point_head")(
            jnp.concatenate([points_map, x], axis=-1)
        )
        cell_v = jnp.linspace(-1.0, 1.0, hc + 1, dtype=image.dtype)
        cell_u = jnp.linspace(-1.0, 1.0, wc + 1, dtype=image.dtype)
        cv = 0.5 * (cell_v[:-1] + cell_v[1:])
        cu = 0.5 * (cell_u[:-1] + cell_u[1:])
        cvv, cuu = jnp.meshgrid(cv, cu, indexing="ij")
        centres = jnp.stack([cuu, cvv], axis=-1)[None]  # (1, hc, wc, 2)
        max_off = jnp.asarray(
            [
                self.max_offset_cells * 2.0 / wc,
                self.max_offset_cells * 2.0 / hc,
            ],
            image.dtype,
        )
        points_grid = centres + jnp.tanh(head[..., 0:2]) * max_off
        scores = head[..., 2]

        points = points_grid.reshape(b, -1, 2)
        descriptors = x.reshape(b, -1, d)
        return FeaturePoints(
            points=points,
            descriptors=descriptors,
            scores=scores.reshape(b, -1),
        )
