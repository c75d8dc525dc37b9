"""Visual front-end: images -> fixed-N matched coordinates.

Closes the reference's intended pipeline (never wired up there: the
detector is WIP/broken, the matcher untrained —
``networks/modules/feature_detection_module.py:66-88``,
``feature_match_module.py:34-39``, composed only abstractly by
``networks/guess_and_solver_model.py:8-22``): a conv feature detector runs
on every view of a keyframe window, the first view's strongest ``N``
features are selected (fixed N — static shapes under jit), and the
attention matcher regresses each selected feature's coordinates in every
other view.  The output has exactly the ``(B, M, N, 2)`` observation
schema the calibration / window-BA solvers consume, so learned matches
are a drop-in replacement for oracle matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from davo_tpu.types import FeaturePoints
from .detector import FeatureDetectionModule
from .matcher import FeatureMatchModule

__all__ = ["FrontendOutput", "VOFrontend", "select_matches"]


class FrontendOutput(NamedTuple):
    """Everything the training losses and the solver need.

    * ``points``: ``(B, M, K, 2)`` all detected feature coordinates.
    * ``scores``: ``(B, M, K)`` detection-confidence logits.
    * ``matched``: ``(B, M, K, 2)`` for each of the anchor view's K
      features, its (regressed) coordinates in view m; view 0 is the
      anchor's own detected coordinates.
    * ``matches``: ``(B, M, N, 2)`` the top-N-by-anchor-score subset —
      the solver-facing observations.
    * ``match_visibility``: ``(B, M, N)`` in-bounds (and, when confidence
      gating is on, confident) flags of ``matches``.
    * ``confidence``: ``(B, M, K)`` peak attention weight per anchor
      feature and view (view 0 = 1), or ``None`` when gating is off.
    """

    points: jax.Array
    scores: jax.Array
    matched: jax.Array
    matches: jax.Array
    match_visibility: jax.Array
    confidence: jax.Array | None = None


def select_matches(
    matched: jax.Array,
    anchor_scores: jax.Array,
    num_select: int,
    nms_radius: float = 0.0,
):
    """Top-``num_select`` anchor features by score, with in-bounds flags.

    With ``nms_radius > 0`` the selection is greedy non-maximum
    suppression in the anchor view: after each pick, every feature within
    the radius of the picked coordinate is suppressed — otherwise several
    coarse cells locked onto the same rendered blob are selected as
    "distinct" points, starving the solver of constraints (a window solve
    with N duplicated observations is effectively under-determined).

    :param matched: ``(B, M, K, 2)`` per-view coordinates of the anchor's
        K features (view 0 = the anchor's own coordinates).
    :param anchor_scores: ``(B, K)``.
    :return: ``(matches (B, M, N, 2), visibility (B, M, N))``.
    """
    if nms_radius <= 0.0:
        _, idx = jax.lax.top_k(anchor_scores, num_select)  # (B, N)
    else:
        anchor_pts = matched[:, 0]  # (B, K, 2)
        scores = anchor_scores
        neg_inf = jnp.asarray(-jnp.inf, anchor_scores.dtype)
        picks = []
        for _ in range(num_select):
            i = jnp.argmax(scores, axis=-1)  # (B,)
            picks.append(i)
            pos = jnp.take_along_axis(
                anchor_pts, i[:, None, None], axis=1
            )  # (B, 1, 2)
            d2 = jnp.sum(jnp.square(anchor_pts - pos), axis=-1)  # (B, K)
            scores = jnp.where(d2 < nms_radius**2, neg_inf, scores)
        idx = jnp.stack(picks, axis=-1)  # (B, N)
    matches = jnp.take_along_axis(
        matched, idx[:, None, :, None], axis=2
    )  # (B, M, N, 2)
    visibility = (jnp.abs(matches[..., 0]) < 1.0) & (
        jnp.abs(matches[..., 1]) < 1.0
    )
    return matches, visibility, idx


class VOFrontend(nn.Module):
    """Detector + attention matcher over a keyframe window.

    :param num_select: N — matches handed to the solver per window.
    :param descriptor_channels: detector descriptor width.
    :param embedding_size: matcher key/query projection width.
    """

    num_select: int = 8
    descriptor_channels: int = 64
    embedding_size: int = 64
    dropout: float = 0.0
    # Gate solver-facing matches on the matcher's peak attention weight
    # (ambiguous rows regress a blend of candidates — better masked out
    # than fed to the solver as a confident observation). 0 disables.
    match_confidence_threshold: float = 0.0
    # Greedy NMS radius (in [-1, 1] units) for the anchor-feature
    # selection; 0 disables (see select_matches).
    nms_radius: float = 0.0

    @nn.compact
    def __call__(
        self, images: jax.Array, *, training: bool = False
    ) -> FrontendOutput:
        """
        :param images: ``(B, M, H, W, C)`` window views.
        :return: :class:`FrontendOutput`.
        """
        b, m, h, w, c = images.shape
        feats = FeatureDetectionModule(
            descriptor_channels=self.descriptor_channels, name="detector"
        )(images.reshape(b * m, h, w, c), training=training)
        k = feats.points.shape[1]
        points = feats.points.reshape(b, m, k, 2)
        descriptors = feats.descriptors.reshape(b, m, k, -1)
        scores = feats.scores.reshape(b, m, k)

        matcher = FeatureMatchModule(
            descriptor_size=self.descriptor_channels,
            embedding_size=self.embedding_size,
            dropout=self.dropout,
            name="matcher",
        )
        # one matcher call over all (M - 1) target views: the anchor's
        # features are tiled across the view axis folded into the batch
        anchor_desc = jnp.broadcast_to(
            descriptors[:, 0:1], (b, m - 1, k, descriptors.shape[-1])
        ).reshape(b * (m - 1), k, -1)
        anchor_pts = jnp.broadcast_to(
            points[:, 0:1], (b, m - 1, k, 2)
        ).reshape(b * (m - 1), k, 2)
        target = FeaturePoints(
            points=points[:, 1:].reshape(b * (m - 1), k, 2),
            descriptors=descriptors[:, 1:].reshape(b * (m - 1), k, -1),
        )
        gate = self.match_confidence_threshold > 0.0
        matched_out = matcher(
            FeaturePoints(points=anchor_pts, descriptors=anchor_desc),
            target,
            training=training,
            return_confidence=gate,
        )
        confidence = None
        if gate:
            matched_out, conf_rest = matched_out
            confidence = jnp.concatenate(
                [
                    jnp.ones((b, 1, k), conf_rest.dtype),
                    conf_rest.reshape(b, m - 1, k),
                ],
                axis=1,
            )
        matched_rest = matched_out.points_b.reshape(b, m - 1, k, 2)
        matched = jnp.concatenate([points[:, 0:1], matched_rest], axis=1)

        matches, visibility, idx = select_matches(
            matched, scores[:, 0], self.num_select, nms_radius=self.nms_radius
        )
        if gate:
            conf_sel = jnp.take_along_axis(
                confidence, idx[:, None, :], axis=2
            )
            visibility = visibility & (
                conf_sel > self.match_confidence_threshold
            )
        return FrontendOutput(
            points=points,
            scores=scores,
            matched=matched,
            matches=matches,
            match_visibility=visibility,
            confidence=confidence,
        )
