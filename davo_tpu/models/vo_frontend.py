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

__all__ = ["FrontendOutput", "VOFrontend", "select_matches", "frontend_detect"]


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
    # --- eval-time match verification (solver-facing outputs only; the
    # raw ``matched`` regression is untouched so training losses keep
    # their gradients) -------------------------------------------------
    # Snap: a regressed coordinate that does not land within this radius
    # of ANY detected feature in its view is an outlier (the soft
    # attention blended several candidates); inside the radius the
    # coordinate is replaced by the detection itself, which localises the
    # blob better than the attention blend. 0 disables.
    snap_radius: float = 0.0
    # Cycle consistency: the snapped target feature is matched BACK to
    # the anchor view (same matcher, roles swapped); the round trip must
    # return within this distance of the original anchor feature.
    # Catches confident-but-wrong assignments that snap alone keeps.
    # 0 disables.
    cycle_threshold: float = 0.0
    # Selection bias toward tracks that pass the verification gates in
    # many views (added to the anchor detection score as
    # ``bonus * valid_fraction``); 0 keeps pure score ranking.
    quality_bonus: float = 0.0
    # Drop tracks whose anchor detection probability (sigmoid of the
    # score logit) is below this — when fewer real blobs than
    # ``num_select`` are visible, the trailing selections are junk that
    # must be masked, not fed to the solver. With snapping on, the
    # snapped target detection must also pass. 0 disables.
    score_threshold: float = 0.0
    # Subpixel refinement: mean-shift each detected coordinate to the
    # local intensity centroid (see ``detector.refine_points_centroid``).
    # The conv detector localises to ~1 px; the centroid reaches well
    # under half a pixel on the rendered blobs. 0 disables.
    centroid_refine_iters: int = 0
    centroid_radius_px: int = 4
    # Soft gating (round-3 sparsity diagnosis): hard verification masks
    # leave windows UNDER-CONSTRAINED — a 4-view/8-point window has only
    # ~2*sum(vis) observations against 38 free DOF, and with oracle-exact
    # pixels the gated visibility pattern ALONE costs 13 deg of window
    # rotation error (vs 0.9 deg at full visibility). With a floor > 0,
    # matches that fail the gates but are in-bounds keep this weight in
    # the solve instead of being dropped: full constraint count, bounded
    # damage from the ~2-6% verified-wrong assignments (pair with
    # ``irls_rounds`` in the window solve for geometry-informed cleanup).
    # match_visibility becomes a float weight map. 0 keeps hard masks.
    soft_gate_floor: float = 0.0
    # Sequential-tracking snap-cost terms (track_sequence mode only):
    # candidate detection cost = |det - regression|^2
    #   + track_motion_weight * |det - previous track position|^2
    #   + track_desc_weight * (1 - cos(track descriptor, det descriptor)).
    # Continuity + appearance disambiguate identity when two blobs pass
    # close and the attention regression lands between them.
    track_motion_weight: float = 0.0
    track_desc_weight: float = 0.0

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        *,
        training: bool = False,
        track_sequence: bool = False,
    ) -> FrontendOutput:
        """
        :param images: ``(B, M, H, W, C)`` window views.
        :param track_sequence: sequential tracking with identity chaining
            instead of anchor-at-view-0 matching — for long sequences
            where distant views cannot be matched directly (measured:
            frame-0-anchored tracks over a 16-frame orbit keep pixel
            accuracy but lose IDENTITY 25-67% of the time beyond 2
            frames).  Each frame's detections are matched against the
            running track state (position + descriptor of the last
            confirmed sighting), so every match spans one frame of
            viewpoint change; confirmed sightings update the state and
            unconfirmed tracks coast for later re-acquisition.
        :return: :class:`FrontendOutput`.
        """
        b, m, h, w, c = images.shape
        feats = FeatureDetectionModule(
            descriptor_channels=self.descriptor_channels, name="detector"
        )(images.reshape(b * m, h, w, c), training=training)
        k = feats.points.shape[1]
        flat_points = feats.points
        if self.centroid_refine_iters > 0:
            from .detector import refine_points_centroid

            flat_points = refine_points_centroid(
                images.reshape(b * m, h, w, c),
                flat_points,
                iters=self.centroid_refine_iters,
                radius_px=self.centroid_radius_px,
            )
        points = flat_points.reshape(b, m, k, 2)
        descriptors = feats.descriptors.reshape(b, m, k, -1)
        scores = feats.scores.reshape(b, m, k)

        if track_sequence:
            return self._track_sequence_impl(points, descriptors, scores)

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

        # --- eval-time verification of the solver-facing matches ---------
        solver_matched = matched
        extra_valid = jnp.ones((b, m, k), bool)
        if self.snap_radius > 0.0 or self.cycle_threshold > 0.0:
            d2 = jnp.sum(
                jnp.square(
                    matched[:, :, :, None, :] - points[:, :, None, :, :]
                ),
                axis=-1,
            )  # (B, M, K, K): regressed coord vs every detection, per view
            snap_idx = jnp.argmin(d2, axis=-1)  # (B, M, K)
            snap_dist = jnp.sqrt(jnp.min(d2, axis=-1) + 1e-12)
        if self.snap_radius > 0.0:
            snapped = jnp.take_along_axis(
                points, snap_idx[..., None], axis=2
            )  # (B, M, K, 2)
            near = snap_dist < self.snap_radius
            solver_matched = jnp.where(near[..., None], snapped, matched)
            # view 0 is the anchor's own detections (snap_dist == 0)
            extra_valid = extra_valid & near
        if self.cycle_threshold > 0.0:
            rev_out = matcher(
                target,
                FeaturePoints(points=anchor_pts, descriptors=anchor_desc),
                training=training,
            )
            rev = jnp.concatenate(
                [
                    points[:, 0:1],
                    rev_out.points_b.reshape(b, m - 1, k, 2),
                ],
                axis=1,
            )  # (B, M, K, 2): each view-m feature regressed back to anchor
            rev_at_match = jnp.take_along_axis(
                rev, snap_idx[..., None], axis=2
            )
            cycle_err = jnp.sqrt(
                jnp.sum(
                    jnp.square(rev_at_match - points[:, 0:1]), axis=-1
                )
                + 1e-12
            )
            extra_valid = extra_valid & (cycle_err < self.cycle_threshold)

        if self.score_threshold > 0.0:
            prob = jax.nn.sigmoid(scores)  # (B, M, K)
            extra_valid = extra_valid & (
                prob[:, 0:1] > self.score_threshold
            )  # anchor track must be a real detection (broadcast over M)
            if self.snap_radius > 0.0:
                snapped_prob = jnp.take_along_axis(prob, snap_idx, axis=2)
                extra_valid = extra_valid & (
                    snapped_prob > self.score_threshold
                )

        sel_scores = scores[:, 0]
        if self.quality_bonus > 0.0:
            valid_frac = jnp.mean(
                extra_valid.astype(sel_scores.dtype), axis=1
            )  # (B, K)
            sel_scores = sel_scores + self.quality_bonus * valid_frac

        matches, visibility, idx = select_matches(
            solver_matched, sel_scores, self.num_select,
            nms_radius=self.nms_radius,
        )
        valid_sel = jnp.take_along_axis(extra_valid, idx[:, None, :], axis=2)
        gates_ok = valid_sel
        if gate:
            conf_sel = jnp.take_along_axis(
                confidence, idx[:, None, :], axis=2
            )
            gates_ok = gates_ok & (
                conf_sel > self.match_confidence_threshold
            )
        if self.soft_gate_floor > 0.0:
            visibility = visibility.astype(matches.dtype) * jnp.where(
                gates_ok, 1.0, self.soft_gate_floor
            )
        else:
            visibility = visibility & gates_ok
        return FrontendOutput(
            points=points,
            scores=scores,
            matched=matched,
            matches=matches,
            match_visibility=visibility,
            confidence=confidence,
        )

    def _track_sequence_impl(self, points, descriptors, scores):
        """Sequential identity-chained tracking (see ``track_sequence``).

        Runs inside the compact ``__call__`` so the matcher parameters are
        shared with the window path.  Python loop over frames: K is a
        static sequence length and each step reuses the same matcher
        parameters (one trace per step, XLA folds them).
        """
        b, m, k, _ = points.shape
        matcher = FeatureMatchModule(
            descriptor_size=self.descriptor_channels,
            embedding_size=self.embedding_size,
            dropout=self.dropout,
            name="matcher",
        )
        prob = jax.nn.sigmoid(scores)  # (B, M, K)

        # initial tracks: frame 0's strongest detections (NMS'd)
        first, vis0, idx0 = select_matches(
            points[:, 0:1], scores[:, 0], self.num_select,
            nms_radius=self.nms_radius,
        )
        pos = first[:, 0]  # (B, N, 2)
        desc = jnp.take_along_axis(
            descriptors[:, 0], idx0[..., None], axis=1
        )  # (B, N, D)
        alive = vis0[:, 0]
        if self.score_threshold > 0.0:
            alive = alive & (
                jnp.take_along_axis(prob[:, 0], idx0, axis=1)
                > self.score_threshold
            )

        coords = [pos]
        valid = [alive]
        for f in range(1, m):
            target = FeaturePoints(
                points=points[:, f], descriptors=descriptors[:, f]
            )
            out = matcher(
                FeaturePoints(points=pos, descriptors=desc), target
            )
            reg = out.points_b  # (B, N, 2)
            d2 = jnp.sum(
                jnp.square(reg[:, :, None, :] - points[:, f, None, :, :]),
                axis=-1,
            )  # (B, N, K)
            cost = d2
            if self.track_motion_weight > 0.0:
                d2_prev = jnp.sum(
                    jnp.square(
                        pos[:, :, None, :] - points[:, f, None, :, :]
                    ),
                    axis=-1,
                )
                cost = cost + self.track_motion_weight * d2_prev
            if self.track_desc_weight > 0.0:
                t_n = desc / jnp.maximum(
                    jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
                )
                d_n = descriptors[:, f] / jnp.maximum(
                    jnp.linalg.norm(
                        descriptors[:, f], axis=-1, keepdims=True
                    ),
                    1e-8,
                )
                cos = jnp.einsum("bnd,bkd->bnk", t_n, d_n)
                cost = cost + self.track_desc_weight * (1.0 - cos)
            snap_idx = jnp.argmin(cost, axis=-1)
            snap_dist = jnp.sqrt(
                jnp.take_along_axis(d2, snap_idx[..., None], axis=-1)[
                    ..., 0
                ]
                + 1e-12
            )
            snapped = jnp.take_along_axis(
                points[:, f], snap_idx[..., None], axis=1
            )
            ok = alive & (
                (jnp.abs(snapped[..., 0]) < 1.0)
                & (jnp.abs(snapped[..., 1]) < 1.0)
            )
            if self.snap_radius > 0.0:
                ok = ok & (snap_dist < self.snap_radius)
            if self.score_threshold > 0.0:
                ok = ok & (
                    jnp.take_along_axis(prob[:, f], snap_idx, axis=1)
                    > self.score_threshold
                )
            # confirmed sightings advance the track state; unconfirmed
            # tracks coast on their last state for re-acquisition
            pos = jnp.where(ok[..., None], snapped, pos)
            new_desc = jnp.take_along_axis(
                descriptors[:, f], snap_idx[..., None], axis=1
            )
            desc = jnp.where(ok[..., None], new_desc, desc)
            coords.append(jnp.where(ok[..., None], snapped, reg))
            valid.append(ok)

        matches = jnp.stack(coords, axis=1)  # (B, M, N, 2)
        visibility = jnp.stack(valid, axis=1)  # (B, M, N)
        return FrontendOutput(
            points=points,
            scores=scores,
            matched=matches,
            matches=matches,
            match_visibility=visibility,
            confidence=None,
        )


def frontend_detect(frontend: "VOFrontend", variables, images: jax.Array):
    """Detector-only pass exposing per-detection descriptors.

    The geometric-association incremental pipeline
    (``train/vo_eval.py::solve_incremental_vo_detections``) associates
    predicted track projections to raw detections by distance alone; the
    detector's descriptors carry an identity signal that breaks spatial
    ties (hard seeds: 20-40% wrong associations at blob spacing ~
    prediction error).  Applies the frontend's ``detector`` submodule
    directly with the matching variable subtree (a flax method cannot
    instantiate submodules outside its one ``@compact`` method).

    :param variables: the full VOFrontend variable dict.
    :param images: ``(B, M, H, W, C)``.
    :return: ``(points (B, M, K, 2), scores (B, M, K),
        descriptors (B, M, K, D))``.
    """
    b, m, h, w, c = images.shape
    detector = FeatureDetectionModule(
        descriptor_channels=frontend.descriptor_channels
    )
    sub = {"params": variables["params"]["detector"]}
    if variables.get("batch_stats", {}).get("detector"):
        sub["batch_stats"] = variables["batch_stats"]["detector"]
    feats = detector.apply(sub, images.reshape(b * m, h, w, c), training=False)
    k = feats.points.shape[1]
    flat_points = feats.points
    if frontend.centroid_refine_iters > 0:
        from .detector import refine_points_centroid

        flat_points = refine_points_centroid(
            images.reshape(b * m, h, w, c),
            flat_points,
            iters=frontend.centroid_refine_iters,
            radius_px=frontend.centroid_radius_px,
        )
    return (
        flat_points.reshape(b, m, k, 2),
        feats.scores.reshape(b, m, k),
        feats.descriptors.reshape(b, m, k, -1),
    )
