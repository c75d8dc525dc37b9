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

__all__ = [
    "UpscaleModule",
    "UpscaleWithSkipModule",
    "FeatureDetectionModule",
    "refine_points_centroid",
]


def refine_points_centroid(
    images: jax.Array,
    points: jax.Array,
    *,
    iters: int = 2,
    radius_px: int = 4,
    weight_sigma_px: float = 2.0,
) -> jax.Array:
    """Subpixel keypoint refinement by local intensity centroid.

    The conv detector localises blobs to ~1 px (bounded cell offsets); the
    rendered blobs (``data/rendering.py::render_frame``) are radially
    symmetric patterns, so the background-subtracted, Gaussian-windowed
    intensity centroid around a detection is an unbiased subpixel
    estimator of the blob centre — a classical mean-shift refinement that
    needs no training. Coordinates follow the rendering convention: pixel
    ``(y, x)`` centre sits at ``((x + 0.5) / W * 2 - 1, (y + 0.5) / H * 2
    - 1)``.

    :param images: ``(V, H, W, C)``.
    :param points: ``(V, K, 2)`` ``(u, v)`` coordinates in ``[-1, 1]``.
    :param iters: mean-shift iterations (the window re-centres each time).
    :param radius_px: half-width of the square refinement window.
    :param weight_sigma_px: Gaussian window sigma in pixels (~ blob sigma).
    :return: refined ``(V, K, 2)`` coordinates.
    """
    v, h, w, _ = images.shape
    gray = jnp.mean(images, axis=-1)  # (V, H, W)
    win = 2 * radius_px + 1
    offs = jnp.arange(win, dtype=points.dtype) - radius_px
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    gauss = jnp.exp(
        -(jnp.square(ox) + jnp.square(oy))
        / (2.0 * weight_sigma_px * weight_sigma_px)
    )

    def refine_one(img, p):
        def step(p, _):
            x_pix = (p[0] + 1.0) * 0.5 * w - 0.5
            y_pix = (p[1] + 1.0) * 0.5 * h - 0.5
            cx = jnp.clip(
                jnp.round(x_pix).astype(jnp.int32) - radius_px, 0, w - win
            )
            cy = jnp.clip(
                jnp.round(y_pix).astype(jnp.int32) - radius_px, 0, h - win
            )
            patch = jax.lax.dynamic_slice(img, (cy, cx), (win, win))
            # local background subtraction: the blob sits on a smooth
            # background + noise; the median of the window is a robust
            # background level (the blob covers < half the window)
            wgt = jnp.maximum(patch - jnp.median(patch), 0.0) * gauss
            s = jnp.sum(wgt) + 1e-8
            mx = cx + radius_px + jnp.sum(wgt * ox) / s
            my = cy + radius_px + jnp.sum(wgt * oy) / s
            refined = jnp.stack(
                [(mx + 0.5) / w * 2.0 - 1.0, (my + 0.5) / h * 2.0 - 1.0]
            )
            return refined.astype(p.dtype), None
        out, _ = jax.lax.scan(step, p, None, length=iters)
        return out

    return jax.vmap(
        lambda img, pts: jax.vmap(lambda p: refine_one(img, p))(pts)
    )(gray, points)


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
