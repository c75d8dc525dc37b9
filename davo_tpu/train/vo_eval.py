"""Windowed visual-odometry evaluation on synthetic sequences.

BASELINE.md's accuracy target is trajectory error on synthetic sequences.
This harness provides the full loop:

1. generate a smooth synthetic camera trajectory observing a global point
   cloud (oracle matches — the same observation model as the reference's
   dataset, extended from independent scenes to a sequence),
2. split the sequence into overlapping keyframe windows and solve each
   window's bundle adjustment (Schur solver) in the frame of its first
   camera, initialised from the previous window's estimates (scale is
   chained by pinning a point depth to its running estimate),
3. compose the window-relative poses into an absolute trajectory,
4. report ATE after similarity alignment.

Everything is jit-compatible; the window loop is a ``lax.scan`` when the
windows share shapes (they do — fixed window size).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from davo_tpu.utils import full_f32_matmuls as _full_f32_matmuls
from davo_tpu.geometry import (
    axis_angle_from_matrix,
    rotate_vector_axis_angle,
    so3_rotation_matrix,
)
from davo_tpu.parallel import (
    BAObservations,
    BAProblem,
    SchurConfig,
    ba_cost,
    schur_ba_solve,
)
from .evaluation import absolute_trajectory_error, camera_centers_from_poses

__all__ = [
    "TrajectoryConfig",
    "generate_trajectory",
    "render_trajectory_images",
    "solve_windowed_vo",
    "solve_windowed_vo_learned",
    "solve_incremental_vo",
    "solve_incremental_vo_detections",
    "solve_learned_vo_incremental",
    "pnp_pose",
    "stitch_windows_global",
    "triangulate_points",
    "refine_trajectory_global",
    "refine_trajectory_multistart",
    "refine_trajectory_host_f64",
    "evaluate_vo",
    "evaluate_learned_vo",
    "observations_for_poses",
    "evaluate_vo_sequence_file",
]


@dataclasses.dataclass(frozen=True)
class TrajectoryConfig:
    num_frames: int = 16
    num_points: int = 32
    window: int = 4  # frames per BA window
    radius: float = 12.0  # orbit radius of the camera path
    focal_length: float = 1.4
    pixel_noise: float = 0.0
    init_noise: float = 0.02  # perturbation of the odometry initialisation
    solver: SchurConfig = SchurConfig(iterations=10, damping=1e-4)
    # learned-VO window stride (0 = default ``window - 2``); smaller
    # strides give more window overlap, hence more stitching constraints
    stride: int = 0


def _pose_from_matrix(rot: jax.Array, centre: jax.Array) -> jax.Array:
    """``(..., 6)`` pose [axis-angle, t] with ``t = -R c``."""
    w = axis_angle_from_matrix(rot)
    t = -jnp.einsum("...ij,...j->...i", rot, centre)
    return jnp.concatenate([w, t], axis=-1)


@_full_f32_matmuls
def generate_trajectory(key: jax.Array, config: TrajectoryConfig):
    """Synthetic sequence: cameras orbit a point cloud, always looking at
    its centre.

    :return: ``(poses (K, 6), points (N, 3), pixels (K, N, 2),
        visibility (K, N))`` with poses world->camera.
    """
    k_pts, k_noise = jax.random.split(key)
    n, kf = config.num_points, config.num_frames
    points = jnp.concatenate(
        [
            3.0 * jax.random.normal(k_pts, (n, 2)),
            3.0 * jax.random.normal(jax.random.fold_in(k_pts, 1), (n, 1)),
        ],
        axis=-1,
    )
    # camera path: a circular arc around the cloud in the xz plane with a
    # gentle vertical bob
    angles = jnp.linspace(0.0, 1.5 * jnp.pi, kf)
    centres = jnp.stack(
        [
            config.radius * jnp.sin(angles),
            1.5 * jnp.sin(2.0 * angles),
            -config.radius * jnp.cos(angles),
        ],
        axis=-1,
    )
    # look-at toward the origin with world-up = -y (shared right-handed
    # construction from the data generator)
    from davo_tpu.data.synthetic import _look_at_rotation

    rot = _look_at_rotation(-centres, jnp.asarray([0.0, -1.0, 0.0]))
    poses = _pose_from_matrix(rot, centres)

    rel = (
        jnp.einsum("kij,nj->kni", rot, points)
        + poses[:, None, 3:6]
    )
    f = config.focal_length
    u = f * rel[..., 0] / rel[..., 2]
    v = f * rel[..., 1] / rel[..., 2]
    pixels = jnp.stack([u, v], axis=-1)
    if config.pixel_noise > 0.0:
        pixels = pixels + config.pixel_noise * jax.random.normal(
            k_noise, pixels.shape
        )
    visibility = (
        (jnp.abs(u) < 1.0) & (jnp.abs(v) < 1.0) & (rel[..., 2] > 0.1)
    )
    return poses, points, pixels, visibility


def render_trajectory_images(
    pixels: jax.Array,
    visibility: jax.Array,
    key: jax.Array,
    render_config=None,
) -> jax.Array:
    """Render the sequence's frames as images (shared point appearance).

    The image-pipeline analogue of handing the solver oracle matches:
    the same projections, but observed only through rendered blobs that
    the visual front-end must detect and match.

    :param pixels: ``(K, N, 2)`` oracle projections.
    :param visibility: ``(K, N)``.
    :return: ``(K, H, W, C)`` images.
    """
    from davo_tpu.data.rendering import (
        RenderConfig,
        render_views,
        sample_appearance,
    )

    if render_config is None:
        render_config = RenderConfig()
    k_app, k_noise = jax.random.split(key)
    appearance = sample_appearance(k_app, pixels.shape[1], render_config)
    return render_views(pixels, visibility, appearance, render_config, k_noise)


def _compose(base_pose: jax.Array, rel_pose: jax.Array) -> jax.Array:
    """Compose world->camera poses: ``rel`` is expressed in the frame of
    ``base``'s camera; returns the absolute world->camera pose."""
    r_base = so3_rotation_matrix(base_pose[0:3])
    r_rel = so3_rotation_matrix(rel_pose[0:3])
    r_abs = r_rel @ r_base
    t_abs = r_rel @ base_pose[3:6] + rel_pose[3:6]
    return jnp.concatenate([axis_angle_from_matrix(r_abs), t_abs])


def _to_window_frame(poses: jax.Array, anchor: jax.Array) -> jax.Array:
    """Express absolute poses relative to the anchor camera's frame:
    ``rel = pose o anchor^-1``."""
    r_a = so3_rotation_matrix(anchor[0:3])
    t_a = anchor[3:6]

    def one(pose):
        r_p = so3_rotation_matrix(pose[0:3])
        r_rel = r_p @ r_a.T
        t_rel = pose[3:6] - r_rel @ t_a
        return jnp.concatenate([axis_angle_from_matrix(r_rel), t_rel])

    return jax.vmap(one)(poses)


@_full_f32_matmuls
def solve_windowed_vo(
    true_poses: jax.Array,
    points: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
    config: TrajectoryConfig,
    key: jax.Array,
    intrinsics: jax.Array | None = None,
) -> jax.Array:
    """Estimate the trajectory by chaining per-window bundle adjustments.

    Windows of ``config.window`` consecutive frames overlap by one frame.
    Each window is solved in its first camera's frame, initialised from a
    noise-perturbed odometry prior (simulating an initial-guess network /
    integrated odometry), and chained onto the running estimate.

    :return: ``(K, 6)`` estimated absolute poses (gauge: frame 0).
    """
    kf = true_poses.shape[0]
    w = config.window
    stride = w - 1
    num_windows = (kf - 1 + stride - 1) // stride
    if intrinsics is None:
        intrinsics = jnp.asarray([config.focal_length, 0.0, 0.0])

    # noisy priors: what an odometry front-end would hand the optimiser
    k1, k2 = jax.random.split(key)
    prior_poses = true_poses.at[1:].add(
        config.init_noise * jax.random.normal(k1, (kf - 1, 6))
    )
    prior_points = points + config.init_noise * jax.random.normal(
        k2, points.shape
    )

    estimates = jnp.zeros((kf, 6)).at[0].set(true_poses[0])
    est_points = prior_points

    for wi in range(num_windows):
        start = min(wi * stride, kf - w)
        idx = jnp.arange(start, start + w)
        anchor_est = estimates[start]
        # window-frame world: points expressed in the anchor camera frame
        r_anchor = so3_rotation_matrix(anchor_est[0:3])
        window_points = (
            jnp.einsum("ij,nj->ni", r_anchor, est_points) + anchor_est[3:6]
        )
        # initial window poses: priors composed into the anchor frame
        window_prior = _to_window_frame(prior_poses[idx], prior_poses[start])
        problem = BAProblem(
            intrinsics=intrinsics,
            poses=window_prior,
            points=window_points,
        )
        obs = BAObservations(
            pixels=pixels[idx], visibility=visibility[idx]
        )
        # intrinsics known: freeze them (the VO setting)
        intr_free = jnp.zeros(3, dtype=bool)
        pose_free = jnp.ones((w, 6), dtype=bool).at[0].set(False)
        point_free = jnp.ones_like(window_points, dtype=bool).at[0, 2].set(
            False
        )
        solved = schur_ba_solve(
            problem,
            obs,
            config.solver,
            gauge_masks=(intr_free, pose_free, point_free),
        )
        # chain window-relative poses onto the anchor estimate
        for j in range(1, w):
            estimates = estimates.at[start + j].set(
                _compose(anchor_est, solved.poses[j])
            )
        # carry refined points back to world coordinates for the next window
        est_points = jnp.einsum(
            "ij,nj->ni", r_anchor.T, solved.points - anchor_est[3:6]
        )
    return estimates


def _window_starts(num_frames: int, window: int, stride: int) -> list:
    """Anchor frames of the overlapping windows covering the sequence."""
    starts = []
    start = 0
    while True:
        start = min(start, num_frames - window)
        starts.append(start)
        if start + window >= num_frames:
            return starts
        start += stride


def _stitch_chain(starts, window_poses, num_frames: int) -> jax.Array:
    """Greedy stitching: rotations chain through each window's anchor;
    each window's gauge scale is fixed from the previously-estimated
    relative translation of the shared pair ``(start, start + 1)``.

    Scale errors compound multiplicatively along the chain — see
    :func:`stitch_windows_global` for the jointly-solved alternative.
    """
    estimates = jnp.zeros((num_frames, 6))
    for wi, start in enumerate(starts):
        poses_w = window_poses[wi]
        w = poses_w.shape[0]
        if wi == 0:
            scale = 1.0
            first_new = 1
        else:
            chained_rel = _to_window_frame(
                estimates[start : start + 2], estimates[start]
            )[1]
            win_rel = poses_w[1]
            num = jnp.linalg.norm(chained_rel[3:6])
            den = jnp.maximum(jnp.linalg.norm(win_rel[3:6]), 1e-9)
            scale = num / den
            # frames up to the previous window's end are already estimated
            first_new = starts[wi - 1] + w - start
        anchor = estimates[start]
        for j in range(first_new, w):
            scaled = poses_w[j].at[3:6].multiply(scale)
            estimates = estimates.at[start + j].set(_compose(anchor, scaled))
    return estimates


@_full_f32_matmuls
def stitch_windows_global(
    starts,
    window_poses,
    num_frames: int,
    rotation_iterations: int = 2,
    robust: bool = False,
) -> jax.Array:
    """Overlap-consistent global stitching of window-relative solves.

    Greedy chaining (:func:`_stitch_chain`) fixes each window's gauge
    scale from a *single* shared frame pair, so per-window scale errors
    compound like a random walk along the sequence — the measured
    limiter of raw stitched ATE.  This solver uses every overlap
    constraint jointly instead:

    1. **Global rotation-graph optimisation** — every window edge
       ``(start, start + j)`` constrains ``R[start+j] = R_rel[w, j] @
       R[start]``.  Starting from greedy chaining, the so(3)-linearised
       residuals ``r_e = log(R_f (R_rel R_s)^T)`` give the linear system
       ``delta_f - delta_s = -r_e`` over per-frame tangent perturbations,
       solved by least squares and applied ``R_f <- exp(delta_f) R_f``
       (iterated Gauss-Newton; residuals are small so 2 iterations
       converge).
    2. **Joint centre/scale least squares** — camera centres obey
       ``c[start+j] = c[start] + s_w * R_anchor[w]^T cw[w, j]`` where
       ``cw`` is the centre in the window's (anchor-frame, arbitrary
       scale) gauge.  This is *linear* in all centres ``c`` and window
       scales ``s_w``; with ``c[0] = 0`` and ``s_0 = 1`` fixing the
       gauge, one tiny dense least-squares solve (3·W·(w−1) equations)
       recovers the maximum-consistency trajectory.

    :param starts: ``W`` window anchor frame indices (static ints).
    :param window_poses: list of ``(w, 6)`` window-relative poses, frame
        ``starts[i]`` = identity in each window's own gauge.
    :param num_frames: ``K``.
    :param robust: Huber-IRLS downweighting of outlier edges in BOTH
        solves. The residual scale is the 70th percentile of residual
        norms with absolute floors (NOT the MAD: after consensus
        chaining most residuals are exactly zero, which collapses a
        median scale and downweights every informative edge). Windows
        whose rotation edges remain outliers after the robust rotation
        pass are additionally hard-downweighted in the centre/scale
        solve — IRLS alone cannot recover there because the unweighted
        initial solution spreads the bad window's translation error
        across edges by leverage. A single catastrophic window solve
        (the measured failure mode of learned-matches VO — ROADMAP
        round 2) otherwise poisons every frame through the
        least-squares coupling; these weights confine the damage to the
        bad window's own frames.
    :return: ``(K, 6)`` absolute world->camera poses (frame 0 identity
        gauge, first window's scale).
    """
    kf = num_frames
    n_win = len(starts)
    w = window_poses[0].shape[0]
    dtype = window_poses[0].dtype
    rel_rots = [so3_rotation_matrix(wp[:, 0:3]) for wp in window_poses]

    # pass 1: rotation chaining seeds the graph optimisation.  Greedy
    # (first-covering-window) chaining is exact-consistent with most
    # edges; the robust path instead takes, per frame, the CONSENSUS
    # candidate over all covering windows (the candidate closest to the
    # others) — a catastrophic window must not poison the init, because
    # Gauss-Newton cannot linearise its way back from a 60-degree-off
    # node whose every edge looks like an outlier.
    rot = [None] * kf
    rot[0] = jnp.eye(3, dtype=dtype)
    if robust:
        cover = {}
        for wi, s in enumerate(starts):
            for j in range(1, w):
                cover.setdefault(s + j, []).append((wi, s, j))
        for f in range(1, kf):
            cands = [
                rel_rots[wi][j] @ rot[s]
                for wi, s, j in cover.get(f, [])
                if rot[s] is not None
            ]
            if len(cands) == 1:
                rot[f] = cands[0]
                continue
            # stacked pairwise geodesic costs, fully traced (no host
            # syncs). NB with exactly 2 candidates the symmetric costs
            # always tie and argmin degenerates to the first (greedy)
            # candidate — consensus only helps at coverage >= 3.
            cand = jnp.stack(cands)  # (n, 3, 3)
            pair = jnp.einsum("aij,bkj->abik", cand, cand)  # c_a @ c_b^T
            ang = jnp.linalg.norm(
                jax.vmap(jax.vmap(axis_angle_from_matrix))(pair), axis=-1
            )
            rot[f] = cand[jnp.argmin(ang.sum(axis=1))]
    else:
        for wi, s in enumerate(starts):
            for j in range(1, w):
                if rot[s + j] is None:
                    rot[s + j] = rel_rots[wi][j] @ rot[s]

    # pass 2: global rotation-graph Gauss-Newton.  Unknown tangent
    # perturbations delta_1..delta_{K-1} (frame 0 gauge-fixed); every
    # window edge contributes 3 linearised equations.
    edges = [
        (s, s + j, rel_rots[wi][j])
        for wi, s in enumerate(starts)
        for j in range(1, w)
    ]
    nr = 3 * (kf - 1)
    eye3 = jnp.eye(3, dtype=dtype)
    a_rot = jnp.zeros((3 * len(edges), nr), dtype=dtype)
    for e, (s, f, _) in enumerate(edges):
        a_rot = a_rot.at[3 * e : 3 * e + 3, 3 * (f - 1) : 3 * f].set(eye3)
        if s > 0:
            a_rot = a_rot.at[3 * e : 3 * e + 3, 3 * (s - 1) : 3 * s].add(
                -eye3
            )
    def _huber_row_scale(norms, floor):
        # Huber IRLS weight: unit inside the scale, 1/|r| beyond it,
        # returned as sqrt-weights for row scaling. The scale is the 70th
        # percentile of residual norms (NOT the MAD: after consensus
        # chaining most residuals are exactly zero, which collapses a
        # median-based scale and downweights every informative edge)
        # with an absolute floor below which residuals count as inliers.
        scale = jnp.maximum(jnp.percentile(norms, 70.0), floor)
        return jnp.sqrt(jnp.minimum(1.0, scale / jnp.maximum(norms, 1e-12)))

    rot_iters = rotation_iterations + (2 if robust else 0)
    for _ in range(max(0, rot_iters)):
        residuals = [
            axis_angle_from_matrix(rot[f] @ (r_edge @ rot[s]).T)
            for s, f, r_edge in edges
        ]
        b_rot = -jnp.concatenate(residuals)
        a_eff = a_rot
        if robust:
            sw = _huber_row_scale(
                jnp.stack([jnp.linalg.norm(r) for r in residuals]),
                floor=0.02,  # ~1 deg: rotation edges inside it are inliers
            )
            sw3 = jnp.repeat(sw, 3)
            a_eff = a_rot * sw3[:, None]
            b_rot = b_rot * sw3
        delta = jnp.linalg.lstsq(a_eff, b_rot)[0].reshape(kf - 1, 3)
        rot = [rot[0]] + [
            so3_rotation_matrix(delta[f - 1]) @ rot[f] for f in range(1, kf)
        ]

    # per-window outlier gate for the centre solve: windows whose
    # rotation edges stay outliers after the robust rotation pass are
    # known-bad, and their translation edges must not seed the centre
    # least squares (leverage spreads their error across clean edges
    # faster than percentile-IRLS can isolate it). Kept at a small
    # nonzero weight so frames covered ONLY by a bad window remain
    # determined (badly, but locally).
    win_gate = None
    if robust:
        final_norms = jnp.stack(
            [
                jnp.linalg.norm(
                    axis_angle_from_matrix(rot[f] @ (r_edge @ rot[s]).T)
                )
                for s, f, r_edge in edges
            ]
        )
        win_res = final_norms.reshape(n_win, w - 1).max(axis=-1)
        bad_thresh = jnp.maximum(3.0 * jnp.percentile(win_res, 70.0), 0.1)
        win_gate = jnp.where(win_res > bad_thresh, 1e-3, 1.0)

    # joint linear least squares for centres c_1..c_{K-1} and window
    # scales s_1..s_{W-1} (c_0 = 0, s_0 = 1 fix the gauge)
    nc = 3 * (kf - 1)
    nu = nc + (n_win - 1)
    eye3 = jnp.eye(3, dtype=dtype)
    rows, rhs = [], []
    for wi, s in enumerate(starts):
        r_a_t = rot[s].T
        for j in range(1, w):
            cw = -rel_rots[wi][j].T @ window_poses[wi][j, 3:6]
            d = r_a_t @ cw
            f = s + j
            block = jnp.zeros((3, nu), dtype=dtype)
            block = block.at[:, 3 * (f - 1) : 3 * f].set(eye3)
            if s > 0:
                block = block.at[:, 3 * (s - 1) : 3 * s].add(-eye3)
            if wi == 0:
                rhs.append(d)
            else:
                block = block.at[:, nc + wi - 1].set(-d)
                rhs.append(jnp.zeros(3, dtype=dtype))
            rows.append(block)
    a_mat = jnp.concatenate(rows, axis=0)
    b_vec = jnp.concatenate(rhs, axis=0)
    if robust:
        # robust-initialised: gate known-bad windows' edges BEFORE the
        # first solve, then IRLS-refine from that clean solution
        gate = jnp.repeat(win_gate, w - 1)  # rows follow edge order
        gate3 = jnp.repeat(gate, 3)
        solution = jnp.linalg.lstsq(
            a_mat * gate3[:, None], b_vec * gate3
        )[0]
        # centre-residual floor relative to the window displacement scale
        edge_len = jnp.linalg.norm(b_vec.reshape(-1, 3), axis=-1)
        c_floor = 0.01 * jnp.maximum(jnp.max(edge_len), 1e-6)
        for _ in range(4):
            res = (a_mat @ solution - b_vec).reshape(-1, 3)
            sw = gate * _huber_row_scale(
                jnp.linalg.norm(res, axis=-1), floor=c_floor
            )
            sw3 = jnp.repeat(sw, 3)
            solution = jnp.linalg.lstsq(
                a_mat * sw3[:, None], b_vec * sw3
            )[0]
    else:
        solution = jnp.linalg.lstsq(a_mat, b_vec)[0]
    centres = jnp.concatenate(
        [jnp.zeros((1, 3), dtype=dtype), solution[:nc].reshape(kf - 1, 3)]
    )
    rot_all = jnp.stack(rot)  # (K, 3, 3)
    t_all = -jnp.einsum("kij,kj->ki", rot_all, centres)
    return jnp.concatenate([axis_angle_from_matrix(rot_all), t_all], axis=-1)


@_full_f32_matmuls
def solve_windowed_vo_learned(
    guess_fn,
    pixels: jax.Array,
    visibility: jax.Array,
    config: TrajectoryConfig,
    stitch: str = "global",
    images: jax.Array | None = None,
    frontend_fn=None,
    irls_rounds: int = 0,
) -> jax.Array:
    """Full learned VO: estimate the trajectory from observations alone.

    Each window of ``config.window`` consecutive frames (overlapping by
    ``window - stride`` >= 2) is handed to ``guess_fn`` — typically a
    trained :class:`davo_tpu.models.CalibrationNetwork` (guess +
    in-forward BFGS) — which returns the window's calibration vector in
    the gen-2 layout.  Window-relative poses are stitched into an
    absolute trajectory, either greedily (``stitch="chain"``: rotations
    chain, each window's arbitrary gauge scale fixed from the single
    shared frame pair) or by the overlap-consistent joint solve
    (``stitch="global"``, the default: rotation averaging + one linear
    least squares over all centres and window scales,
    :func:`stitch_windows_global`).

    :param guess_fn: maps ``(pixels (1, M, N, 2), visibility (1, M, N))``
        to a flat calibration vector ``(1, P)``.
    :param pixels: ``(K, N, 2)`` sequence observations (oracle matches;
        ignored when ``frontend_fn`` is given, except for shapes).
    :param visibility: ``(K, N)``.
    :param images: ``(K, H, W, C)`` rendered frames — with
        ``frontend_fn``, each window's observations come from the visual
        front-end (detector + attention matcher) run on these images
        instead of the oracle matches.
    :param frontend_fn: maps ``images (1, M, H, W, C)`` to
        ``(matches (1, M, N, 2), visibility (1, M, N))``.
    :param irls_rounds: geometry-informed re-solves per window: after each
        solve, observations inconsistent with the window's own solution
        are Huber-downweighted (70th-percentile scale, angular floor) and
        the window is re-solved — the outlier-robustness layer the
        verification gates cannot provide (they act on descriptors, not
        geometry).
    :return: ``(K, 6)`` estimated absolute poses (gauge: frame 0 identity,
        scale of the first window).
    """
    from davo_tpu.camera import unpack_calibration_parameters

    kf = pixels.shape[0]
    w = config.window
    if w < 3:
        raise ValueError(
            "learned VO needs window >= 3: consecutive windows overlap by "
            "two frames and the shared pair's relative translation anchors "
            f"each window's gauge scale (got window={w})"
        )
    if kf < w:
        raise ValueError(
            f"sequence of {kf} frames is shorter than the window ({w})"
        )
    stride = config.stride if config.stride else w - 2
    if not 1 <= stride <= w - 2:
        raise ValueError(
            f"stride must be in [1, window - 2] = [1, {w - 2}] so that "
            f"consecutive windows overlap by >= 2 frames (got {stride})"
        )
    if stitch not in ("chain", "global", "robust"):
        raise ValueError(f"unknown stitch mode {stitch!r}")

    if (frontend_fn is None) != (images is None):
        raise ValueError("images and frontend_fn must be given together")

    starts = _window_starts(kf, w, stride)
    window_poses = []
    for s in starts:
        idx = jnp.arange(s, s + w)
        if frontend_fn is not None:
            w_pix, w_vis = frontend_fn(images[idx][None])
        else:
            w_pix, w_vis = pixels[idx][None], visibility[idx][None]
        vec = guess_fn(w_pix, w_vis)[0]
        for _ in range(max(0, irls_rounds)):
            # geometry-informed match reweighting (round-3 diagnosis):
            # verification gates leave a residual ~2-6% of wrong-but-
            # verified assignments, and ONE gross outlier poisons the
            # unrobust in-forward window solve (relaxed gates: 6.8 deg
            # median rotation error vs oracle 0.9 deg). Downweight
            # observations inconsistent with the window's own solution
            # and re-solve — the Huber scale is the 70th percentile of
            # visible residuals with an angular floor, matching the
            # stitcher's convention.
            from davo_tpu.camera import calibration_residuals

            res = calibration_residuals(vec[None], w_pix)[0]  # (M, N)
            vis_b = w_vis[0] > 0
            masked = jnp.where(vis_b, res, jnp.nan)
            # zero visible observations -> all-NaN percentile; guard so
            # the window solve degrades gracefully instead of NaN-ing
            scale = jnp.maximum(
                jnp.nan_to_num(jnp.nanpercentile(masked, 70.0), nan=5e-3),
                5e-3,
            )
            huber = jnp.minimum(1.0, scale / jnp.maximum(res, 1e-9))
            w_vis = (w_vis[0] * huber)[None]
            vec = guess_fn(w_pix, w_vis)[0]
        # N from the window observations themselves: with a learned
        # front-end the global tracks (``pixels``) may be wider than the
        # per-window match count the guess network consumes
        params = unpack_calibration_parameters(vec, w, w_pix.shape[2])
        rel = jnp.concatenate(
            [params.camera_rotations[:, 0, :],
             params.camera_translations[:, 0, :]],
            axis=-1,
        )
        window_poses.append(
            jnp.concatenate([jnp.zeros((1, 6), rel.dtype), rel], axis=0)
        )
    if stitch in ("global", "robust"):
        return stitch_windows_global(
            starts, window_poses, kf, robust=stitch == "robust"
        )
    return _stitch_chain(starts, window_poses, kf)


@_full_f32_matmuls
def triangulate_points(
    poses: jax.Array,
    intrinsics: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
) -> jax.Array:
    """Linear (DLT) triangulation of N points from K posed views.

    For each visible observation, the normalised pixel ray gives two
    linear constraints ``(u' R3 - R1) P = t1 - u' t3`` (and likewise for
    v); the per-point 3x3 normal equations are solved batched.

    :param poses: ``(K, 6)`` world->camera ``[axis-angle, t]``.
    :param intrinsics: ``(3,)`` — ``(f, cx, cy)``.
    :param pixels: ``(K, N, 2)``.
    :param visibility: ``(K, N)``.
    :return: ``(N, 3)`` triangulated world points.
    """
    f, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2]
    rot = so3_rotation_matrix(poses[:, 0:3])  # (K, 3, 3)
    t = poses[:, 3:6]
    u_n = (pixels[..., 0] - cx) / f  # (K, N)
    v_n = (pixels[..., 1] - cy) / f
    r1, r2, r3 = rot[:, 0], rot[:, 1], rot[:, 2]  # (K, 3)
    # rows: (K, N, 3); rhs: (K, N)
    row_u = u_n[..., None] * r3[:, None, :] - r1[:, None, :]
    row_v = v_n[..., None] * r3[:, None, :] - r2[:, None, :]
    rhs_u = t[:, None, 0] - u_n * t[:, None, 2]
    rhs_v = t[:, None, 1] - v_n * t[:, None, 2]
    w = visibility.astype(pixels.dtype)[..., None]
    rows = jnp.concatenate([row_u * w, row_v * w], axis=0)  # (2K, N, 3)
    rhs = jnp.concatenate([rhs_u * w[..., 0], rhs_v * w[..., 0]], axis=0)
    ata = jnp.einsum("kni,knj->nij", rows, rows) + 1e-9 * jnp.eye(
        3, dtype=pixels.dtype
    )
    atb = jnp.einsum("kni,kn->ni", rows, rhs)
    return jnp.linalg.solve(ata, atb[..., None])[..., 0]


@_full_f32_matmuls
def pnp_pose(
    points: jax.Array,
    pixels: jax.Array,
    weights: jax.Array,
    intrinsics: jax.Array,
    init_pose: jax.Array,
    iterations: int = 20,
    huber_rounds: int = 2,
) -> jax.Array:
    """Perspective-n-Point: LM-refine one camera pose against known 3-D
    points (fixed intrinsics).

    The well-determined building block of incremental VO: 6 pose
    parameters against ``2 * sum(weights)`` reprojection constraints —
    unlike a free-intrinsics window solve, PnP at >= 4 visible tracks is
    over-determined and noise-stable.  ``huber_rounds`` re-solves with
    residual-scaled Huber weights for outlier robustness.

    :param points: ``(N, 3)`` world points.
    :param pixels: ``(N, 2)`` observations in this frame.
    :param weights: ``(N,)`` observation weights (0 = unseen).
    :param init_pose: ``(6,)`` ``[axis-angle, t]`` world->camera start.
    :return: ``(6,)`` refined pose.
    """
    from davo_tpu.solve.least_squares import LMConfig, levenberg_marquardt

    f, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2]

    def residuals_of(pose, w):
        rel = rotate_vector_axis_angle(points, pose[0:3]) + pose[3:6]
        z = jnp.maximum(rel[..., 2], 1e-6)
        u = f * rel[..., 0] / z + cx
        v = f * rel[..., 1] / z + cy
        res = jnp.stack([u, v], axis=-1) - pixels  # (N, 2)
        return res * w[:, None]

    pose = init_pose
    w = weights
    for round_i in range(1 + max(0, huber_rounds)):

        def residual_and_jacobian(p, w=w):
            flat = lambda q: residuals_of(q, w).reshape(-1)
            return flat(p), jax.jacfwd(flat)(p)

        pose = levenberg_marquardt(
            residual_and_jacobian, pose, LMConfig(iterations=iterations)
        )
        if round_i < huber_rounds:
            norms = jnp.linalg.norm(residuals_of(pose, weights), axis=-1)
            masked = jnp.where(weights > 0, norms, jnp.nan)
            # all-zero weights make the percentile NaN (and
            # maximum(NaN, floor) stays NaN) — guard so a degenerate call
            # returns a finite (if useless) pose instead of poisoning
            # every downstream frame through jnp.where
            scale = jnp.maximum(
                jnp.nan_to_num(jnp.nanpercentile(masked, 70.0), nan=1e-3),
                1e-3,
            )
            w = weights * jnp.minimum(1.0, scale / jnp.maximum(norms, 1e-9))
    return pose


# Module-level jitted helpers: the incremental pipeline calls these from
# host loops, per bootstrap-candidate chain and per frame — per-call
# ``jax.jit`` wrappers would re-trace and re-compile everything for every
# candidate chain (measured: 13-chain sweeps exhaust XLA:CPU's executable
# code sections with "Cannot allocate memory"), while one module-level
# wrapper compiles once per shape for the whole process.
_pnp_jit = jax.jit(pnp_pose)
_tri_jit = jax.jit(triangulate_points)
_pnp_batch_jit = jax.jit(
    jax.vmap(pnp_pose, in_axes=(None, None, 0, None, None))
)
# schur_ba_solve runs eagerly op-by-op otherwise — thousands of tiny
# XLA:CPU executables per chain (slow, and enough of them crash the
# process's code sections); SchurConfig is a frozen dataclass, so it
# hashes as a static argument.
_schur_jit = jax.jit(schur_ba_solve, static_argnames="config")


@_full_f32_matmuls
def solve_incremental_vo(
    tracks: jax.Array,
    visibility: jax.Array,
    intrinsics: jax.Array,
    bootstrap_poses: jax.Array,
    solver: SchurConfig = SchurConfig(iterations=10, damping=1e-3),
    ba_every: int = 4,
    min_pnp_tracks: int = 4,
) -> jax.Array:
    """Incremental SfM over global tracks: PnP + re-triangulation + BA.

    The round-3 learned-VO diagnosis showed independent per-window
    free-intrinsics solves are under-constrained at realistic match
    sparsity (with oracle-exact pixels, the gated visibility pattern alone
    costs 13 deg of window rotation error) — no guess or gate tuning can
    fix a window with fewer observations than free parameters.  This
    solver accumulates constraints instead, the classical way:

    1. bootstrap from the first window's learned solve (gauge + scale),
    2. for each next frame: constant-velocity prediction, then PnP
       (:func:`pnp_pose`) against the current triangulated structure,
    3. re-triangulate all tracks from all posed frames after each new
       frame (every observation sharpens every point),
    4. periodic + final global Schur bundle adjustment.

    :param tracks: ``(K, N, 2)`` track observations (e.g. the visual
        front-end run on the whole sequence, anchor frame 0).
    :param visibility: ``(K, N)`` weights.
    :param intrinsics: ``(3,)`` fixed ``(f, cx, cy)`` (e.g. from the
        bootstrap window's guess).
    :param bootstrap_poses: ``(W0, 6)`` poses of the first ``W0`` frames
        in the frame-0 gauge.
    :return: ``(K, 6)`` world->camera poses.
    """
    kf = tracks.shape[0]
    w0 = bootstrap_poses.shape[0]
    vis = visibility.astype(tracks.dtype)
    poses = [bootstrap_poses[i] for i in range(w0)]

    pnp = _pnp_jit
    tri = _tri_jit

    def current_structure():
        posed = jnp.stack(poses)
        k = posed.shape[0]
        return tri(posed, intrinsics, tracks[:k], vis[:k])

    def run_ba(posed):
        k = posed.shape[0]
        support = (vis[:k] > 0).sum(axis=0) >= 2
        vis_eff = vis[:k] * support[None, :].astype(vis.dtype)
        points = tri(posed, intrinsics, tracks[:k], vis_eff)
        gauge_pt = int(
            np.argmax(np.asarray((vis[:k] > 0).sum(axis=0)))
        )
        masks = (
            jnp.zeros(3, dtype=bool),
            jnp.ones((k, 6), dtype=bool).at[0].set(False),
            jnp.ones((points.shape[0], 3), dtype=bool)
            .at[gauge_pt, 2]
            .set(False),
        )
        solved = _schur_jit(
            BAProblem(intrinsics=intrinsics, poses=posed, points=points),
            BAObservations(pixels=tracks[:k], visibility=vis_eff),
            solver,
            gauge_masks=masks,
        )
        return solved.poses

    for k in range(w0, kf):
        points = current_structure()
        # constant-velocity prediction in the pose group
        prev, prev2 = poses[-1], poses[-2]
        step = _to_window_frame(prev[None], prev2)[0]
        pred = _compose(prev, step)
        # tracks triangulated from >= 2 posed frames are reliable; gate
        # the PnP weights on both visibility and triangulation support
        support = jnp.sum(vis[:k] > 0, axis=0) >= 2
        w = vis[k] * support.astype(vis.dtype)
        # acceptance must count the EFFECTIVE (support-gated) weights:
        # with >= min_pnp_tracks visible but zero supported tracks, PnP
        # would run on all-zero weights and return garbage
        n_eff = jnp.sum(w > 0)
        solved_pose = pnp(points, tracks[k], w, intrinsics, pred)
        pose_k = jnp.where(n_eff >= min_pnp_tracks, solved_pose, pred)
        poses.append(pose_k)
        if (k - w0 + 1) % ba_every == 0:
            refined = run_ba(jnp.stack(poses))
            poses = [refined[i] for i in range(refined.shape[0])]
    final = run_ba(jnp.stack(poses))
    return final


def _associate_detections(
    proj: np.ndarray,
    active: np.ndarray,
    dets: np.ndarray,
    det_ok: np.ndarray,
    radius: float,
    desc_cost: np.ndarray | None = None,
):
    """Greedy 1-1 nearest association of predicted track projections to
    detections (host-side; N and D are tiny).

    ``desc_cost`` (N_tracks, D_dets), when given, is ADDED to the spatial
    distance before the greedy assignment — an identity tie-break from
    the detector's descriptors.  The spatial gate (``radius``) is applied
    to the spatial part alone so descriptors cannot admit a far match."""
    n, d = proj.shape[0], dets.shape[0]
    spatial = np.linalg.norm(proj[:, None, :] - dets[None, :, :], axis=-1)
    cost = spatial if desc_cost is None else spatial + desc_cost
    cost[~active, :] = np.inf
    cost[:, ~det_ok] = np.inf
    cost[spatial > radius] = np.inf
    coords = np.zeros((n, 2), proj.dtype)
    vis = np.zeros((n,), bool)
    for _ in range(min(n, d)):
        i = int(np.argmin(cost))
        ti, di = divmod(i, cost.shape[1])
        if not np.isfinite(cost[ti, di]):
            break
        coords[ti] = dets[di]
        vis[ti] = True
        cost[ti, :] = np.inf
        cost[:, di] = np.inf
    return coords, vis


def solve_incremental_vo_detections(
    detections: jax.Array,
    det_scores: jax.Array,
    intrinsics: jax.Array,
    bootstrap_poses: jax.Array,
    bootstrap_tracks: jax.Array,
    bootstrap_vis: jax.Array,
    solver: SchurConfig = SchurConfig(iterations=10, damping=1e-3),
    ba_every: int = 4,
    min_pnp_tracks: int = 3,
    assoc_radius: float = 0.12,
    score_threshold: float = 0.2,
    refine_intrinsics: bool = False,
    bootstrap_start: int = 0,
    return_cost: bool = False,
    pnp_ransac: int = 0,
    ransac_inlier_radius: float = 0.03,
    chain_passes: int = 1,
    reject_outliers: bool = False,
    reject_radius: float = 0.025,
    ba_irls: int = 0,
    det_descriptors: jax.Array | None = None,
    desc_weight: float = 0.0,
    debug_out: dict | None = None,
) -> jax.Array:
    """Incremental SfM with **geometric data association**.

    Identity-chained descriptor tracking was measured to lose track
    identity 21-41% of the time on close blob passes (the matcher's
    descriptors are not discriminative enough); this variant never asks
    descriptors for identity beyond the bootstrap window.  Each new
    frame: predict the current structure's projections under a
    constant-velocity pose, greedily 1-1 associate them to the frame's
    raw detections (median detection error ~0.003 — the detector is the
    reliable learned component), PnP on the associations, re-associate
    under the refined pose, and continue as in
    :func:`solve_incremental_vo`.

    :param detections: ``(K, D, 2)`` per-frame detected coordinates.
    :param det_scores: ``(K, D)`` detection probabilities.
    :param bootstrap_tracks: ``(W0, N, 2)`` matcher-derived observations
        of the first window (identity over one window is reliable).
    :param pnp_ransac: with ``> 0``, each per-frame PnP becomes a RANSAC
        over association subsets: this many random minimal subsets (plus
        the all-association candidate) are LM-solved in one vmapped
        batch, scored by inlier count at ``ransac_inlier_radius``, and
        the winner is refit on its inliers — a single wrong-but-plausible
        association can no longer drag the pose (the round-3 hard-seed
        failure mode).
    :param chain_passes: total association passes over the sequence.
        Passes after the first rebuild the track table from scratch
        (bootstrap observations only) and predict each frame's pose from
        the previous pass's refined estimate instead of constant velocity —
        early-drift associations baked into pass 1's structure are
        re-made under far better predictions instead of merely being
        patched by re-association.
    :param debug_out: optional dict filled with the final ``tracks``,
        ``vis``, ``intrinsics`` and per-pass diagnostics.
    :return: ``(K, 6)`` world->camera poses.
    """
    kf = detections.shape[0]
    w0, n = bootstrap_tracks.shape[0], bootstrap_tracks.shape[1]
    dtype = detections.dtype
    s0 = int(bootstrap_start)
    if not 0 <= s0 <= kf - w0:
        raise ValueError(f"bootstrap_start {s0} out of range for K={kf}")
    tracks = np.zeros((kf, n, 2), np.asarray(detections).dtype)
    vis = np.zeros((kf, n), np.float64 if dtype == jnp.float64 else np.float32)
    tracks[s0 : s0 + w0] = np.asarray(bootstrap_tracks)
    vis[s0 : s0 + w0] = np.asarray(bootstrap_vis, vis.dtype)
    pose_of = {s0 + i: bootstrap_poses[i] for i in range(w0)}
    solved_frames = list(range(s0, s0 + w0))

    pnp = _pnp_jit
    tri = _tri_jit
    dets_np = np.asarray(detections)
    det_ok_np = np.asarray(det_scores) > score_threshold
    in_bounds = np.all(np.abs(dets_np) < 1.0, axis=-1)
    det_ok_np = det_ok_np & in_bounds

    # --- descriptor identity state (optional) ---------------------------
    use_desc = det_descriptors is not None and desc_weight > 0.0
    if use_desc:
        desc_np = np.asarray(det_descriptors)
        desc_np = desc_np / np.maximum(
            np.linalg.norm(desc_np, axis=-1, keepdims=True), 1e-9
        )  # (K, D_dets, C)
        track_desc = np.zeros((n, desc_np.shape[-1]), desc_np.dtype)

        def _desc_update(track_ids, frame, coords):
            '''Fold the descriptors of accepted detections into the
            per-track reference (EMA then re-normalise).'''
            d = np.linalg.norm(
                coords[:, None, :] - dets_np[frame][None, :, :], axis=-1
            )
            j = d.argmin(axis=1)
            near = d[np.arange(len(j)), j] < 0.02
            for t, det_j, is_near in zip(track_ids, j, near):
                if not is_near:
                    continue
                blend = 0.7 * track_desc[t] + 0.3 * desc_np[frame, det_j]
                track_desc[t] = blend / max(np.linalg.norm(blend), 1e-9)

        def _desc_cost(frame):
            '''(n, D_dets) additive association cost: scaled cosine
            distance of each track reference to each detection.'''
            cos = track_desc @ desc_np[frame].T  # (n, D_dets)
            cost = desc_weight * (1.0 - cos)
            # tracks with no reference yet cost nothing
            has_ref = np.linalg.norm(track_desc, axis=-1) > 0.5
            cost[~has_ref] = 0.0
            return cost

        def _desc_reset():
            track_desc[:] = 0.0
            for f in range(s0, s0 + w0):
                seen = np.flatnonzero(vis[f] > 0)
                _desc_update(seen, f, tracks[f][seen])

        _desc_reset()
    else:

        def _desc_cost(frame):  # noqa: ANN001
            return None

        def _desc_update(track_ids, frame, coords):  # noqa: ANN001
            return None

        def _desc_reset():
            return None

    def subset():
        idx = sorted(solved_frames)
        return (
            idx,
            jnp.stack([pose_of[i] for i in idx]),
            jnp.asarray(tracks[idx]),
            vis[idx],
        )

    intrinsics_box = [intrinsics]

    def run_ba(free_focal=False, reject=False):
        # round structure: [irls rounds...] -> solve -> [reject + resolve]
        irls_w = None  # soft per-call weights, NOT persisted to the table
        for ba_round in range(1 + max(0, ba_irls) + (1 if reject else 0)):
            intrinsics = intrinsics_box[0]
            idx, posed, t_sub, v_sub = subset()
            if irls_w is not None:
                v_sub = v_sub * irls_w
            # points with < 2 supporting frames have junk (min-norm)
            # triangulations; keep their observations out of the BA or
            # the f32 solve can blow up through the rank-deficient point
            # block
            support = (v_sub > 0).sum(axis=0) >= 2
            vis_eff = jnp.asarray(
                v_sub * support[None, :].astype(vis.dtype)
            )
            points = tri(posed, intrinsics, t_sub, vis_eff)
            # scale gauge: pin the z of the BEST-SUPPORTED point —
            # pinning a barely-observed point leaves the scale direction
            # loose and the f32 solve drifts along it (measured:
            # 1e6-sized poses); pose gauge: pin the bootstrap anchor
            gauge_pt = int(np.argmax((v_sub > 0).sum(axis=0)))
            anchor_row = idx.index(s0)
            masks = (
                jnp.asarray([free_focal, False, False]),
                jnp.ones((len(idx), 6), dtype=bool)
                .at[anchor_row]
                .set(False),
                jnp.ones((n, 3), dtype=bool).at[gauge_pt, 2].set(False),
            )
            ba = _schur_jit(
                BAProblem(
                    intrinsics=intrinsics, poses=posed, points=points
                ),
                BAObservations(pixels=t_sub, visibility=vis_eff),
                solver if not free_focal
                else SchurConfig(iterations=15, damping=1e-3),
                gauge_masks=masks,
            )
            for row, i in enumerate(idx):
                pose_of[i] = ba.poses[row]
            if free_focal:
                intrinsics_box[0] = ba.intrinsics
            is_last = ba_round == max(0, ba_irls) + (1 if reject else 0)
            if is_last:
                break
            # residuals under the freshly solved geometry
            idx2, posed2, t_sub2, v_sub2 = subset()
            support2 = (v_sub2 > 0).sum(axis=0) >= 2
            vis_eff2 = v_sub2 * support2[None, :].astype(vis.dtype)
            points2 = tri(
                posed2, intrinsics_box[0], t_sub2, jnp.asarray(vis_eff2)
            )
            proj = jax.vmap(lambda p: project(points2, p)[0])(posed2)
            res = np.linalg.norm(
                np.asarray(proj) - np.asarray(t_sub2), axis=-1
            )
            visb = vis_eff2 > 0
            if not visb.any():
                break
            med = float(np.median(res[visb]))
            if ba_round < max(0, ba_irls):
                # soft Huber reweighting within this BA call only:
                # observations far above the median residual lose weight
                # but keep constraining — gentler than hard rejection,
                # which was measured to make a wrong-but-consistent basin
                # MORE self-consistent by trimming its dissenters
                scale = max(2.0 * med, 5e-3)
                irls_w = np.minimum(1.0, scale / np.maximum(res, 1e-9))
                continue
            # observation-level outlier rejection: wrong-but-plausible
            # associations survive the association gates and corrupt the
            # whole geometry through BA (hard seeds: 20-40% of the
            # observations sit > 4x the median residual).  Detection
            # error is ~0.003-0.006, so anything far above the median
            # residual under the *converged* solution is a wrong
            # association, not noise — cut it from the track table and
            # re-solve once.
            thr = max(4.0 * med, reject_radius)
            bad = visb & (res > thr)
            if not bad.any():
                break
            for row, i in enumerate(idx2):
                vis[i][bad[row]] = 0.0

    def project(points, pose):
        intr = intrinsics_box[0]
        rel = rotate_vector_axis_angle(points, pose[0:3]) + pose[3:6]
        z = jnp.maximum(rel[..., 2], 1e-6)
        u = intr[0] * rel[..., 0] / z + intr[1]
        v = intr[0] * rel[..., 1] / z + intr[2]
        return jnp.stack([u, v], axis=-1), rel[..., 2] > 0.0

    # last observed pixel per track: lets tracks BELOW triangulation
    # support still associate (at their last position — inter-frame blob
    # motion p50 ~0.08 vs spacing p10 ~0.12, and supported tracks claim
    # their detections first in the greedy 1-1 assignment) so the
    # structure pool can grow past the bootstrap's track set
    last_pos = np.zeros((n, 2), tracks.dtype)
    last_seen = np.zeros((n,), bool)
    for f in range(s0, s0 + w0):
        seen = vis[f] > 0
        last_pos[seen] = tracks[f][seen]
        last_seen |= seen

    rng = np.random.default_rng(20240 + s0)
    pnp_batch = _pnp_batch_jit

    def ransac_pnp(points, coords, pnp_ok, pose_init):
        """RANSAC over association subsets: solve PnP on random minimal
        subsets + the full set in one vmapped batch, keep the candidate
        with the most reprojection inliers, refit on its inliers."""
        ok_idx = np.flatnonzero(pnp_ok)
        full_w = pnp_ok.astype(vis.dtype)
        if pnp_ransac <= 0 or ok_idx.size <= min_pnp_tracks + 1:
            return pnp(
                points, jnp.asarray(coords), jnp.asarray(full_w),
                intrinsics, pose_init,
            )
        subset_size = max(4, min_pnp_tracks)
        cand_w = [full_w]
        for _ in range(pnp_ransac):
            pick = rng.choice(ok_idx, size=min(subset_size, ok_idx.size),
                              replace=False)
            w_s = np.zeros_like(full_w)
            w_s[pick] = 1.0
            cand_w.append(w_s)
        cand_poses = pnp_batch(
            points, jnp.asarray(coords), jnp.asarray(np.stack(cand_w)),
            intrinsics, pose_init,
        )
        # score every candidate against ALL associated tracks
        proj_c = jax.vmap(lambda p: project(points, p)[0])(cand_poses)
        res = np.linalg.norm(np.asarray(proj_c) - coords[None], axis=-1)
        res = np.where(pnp_ok[None], res, np.inf)
        inl = res < ransac_inlier_radius
        counts = inl.sum(axis=1)
        mean_res = np.where(
            counts > 0,
            np.where(inl, res, 0.0).sum(axis=1) / np.maximum(counts, 1),
            np.inf,
        )
        best = int(np.lexsort((mean_res, -counts))[0])
        best_inl = inl[best]
        if counts[best] >= min_pnp_tracks and not best_inl.all():
            return pnp(
                points, jnp.asarray(coords),
                jnp.asarray(best_inl.astype(vis.dtype)),
                intrinsics, cand_poses[best],
            )
        return cand_poses[best]

    def run_chain(order, pred_of=None):
        """One association pass over ``order``.  ``pred_of`` (frame ->
        pose) overrides the constant-velocity prediction (used by passes
        seeded from a previous pass's refined trajectory)."""
        nonlocal since_ba, last_seen
        for k in order:
            idx, posed, t_sub, v_sub = subset()
            points = tri(posed, intrinsics, t_sub, jnp.asarray(v_sub))
            # count observing frames, not fractional IRLS weights:
            # bootstrap visibility is Huber-downweighted (< 1), and a
            # track genuinely seen in both bootstrap frames must not
            # fail support
            support = (v_sub > 0).sum(axis=0) >= 2
            if pred_of is not None and k in pred_of:
                pose_k = pred_of[k]
            else:
                # constant-velocity prediction from the two nearest
                # solved frames
                if k > idx[-1]:
                    prev, prev2 = pose_of[idx[-1]], pose_of[idx[-2]]
                else:
                    prev, prev2 = pose_of[idx[0]], pose_of[idx[1]]
                step = _to_window_frame(prev[None], prev2)[0]
                pose_k = _compose(prev, step)
            for _ in range(3):  # associate -> PnP rounds
                proj, in_front = project(points, pose_k)
                proj = np.array(proj)  # writable host copy
                active = (support & np.asarray(in_front)) | last_seen
                unsupported = ~(support & np.asarray(in_front)) & last_seen
                proj[unsupported] = last_pos[unsupported]
                coords, ok = _associate_detections(
                    proj, active, dets_np[k], det_ok_np[k], assoc_radius,
                    desc_cost=_desc_cost(k),
                )
                pnp_ok = ok & support  # only triangulated tracks
                if pnp_ok.sum() < min_pnp_tracks:
                    break
                pose_k = ransac_pnp(points, coords, pnp_ok, pose_k)
            if reject_outliers and (ok & support).sum() >= min_pnp_tracks:
                # cut associations inconsistent with the accepted pose
                # BEFORE they enter the track table: a wrong association
                # at 4x the median residual is identity error, not
                # detection noise, and online BA would bake it in
                proj, _ = project(points, pose_k)
                res = np.linalg.norm(np.asarray(proj) - coords, axis=-1)
                checked = ok & support
                med = float(np.median(res[checked]))
                bad = checked & (res > max(4.0 * med, reject_radius))
                ok = ok & ~bad
            tracks[k] = coords
            vis[k] = ok.astype(vis.dtype)
            last_pos[ok] = coords[ok]
            last_seen |= ok
            if use_desc:
                _desc_update(np.flatnonzero(ok), k, coords[ok])
            pose_of[k] = pose_k
            if k not in solved_frames:
                solved_frames.append(k)
            since_ba += 1
            if since_ba % ba_every == 0:
                run_ba()

    # forward from the bootstrap, then backward from it — an arbitrary
    # bootstrap window covers the whole sequence
    order = list(range(s0 + w0, kf)) + list(range(s0 - 1, -1, -1))
    since_ba = 0
    run_chain(order)
    # final alternation: re-triangulating from the refined poses once
    # more recovers structure that early (drifted) poses seeded badly
    run_ba(reject=reject_outliers)
    run_ba()

    for extra_pass in range(max(0, chain_passes - 1)):
        # re-make every association from scratch under the refined
        # trajectory: pass 1's structure was accumulated with weak
        # constant-velocity predictions, and its early mistakes are a
        # fixed point of re-association (wrong points attract the same
        # wrong detections).  Reset the track table to the bootstrap
        # observations, keep only the refined poses as predictions, and
        # traverse in the opposite direction so the previously-last
        # (best-constrained) frames seed the structure.
        pred_of = dict(pose_of)
        tracks[:] = 0.0
        vis[:] = 0.0
        tracks[s0 : s0 + w0] = np.asarray(bootstrap_tracks)
        vis[s0 : s0 + w0] = np.asarray(bootstrap_vis, vis.dtype)
        solved_frames.clear()
        solved_frames.extend(range(s0, s0 + w0))
        last_pos[:] = 0.0
        last_seen[:] = False
        for f in range(s0, s0 + w0):
            seen = vis[f] > 0
            last_pos[seen] = tracks[f][seen]
            last_seen |= seen
        _desc_reset()
        since_ba = 0
        # alternate traversal direction each pass: reversed(order) visits
        # pass 1's last-solved (best-constrained) frames first, so they
        # seed the rebuilt structure
        pass_order = list(reversed(order)) if extra_pass % 2 == 0 else order
        run_chain(pass_order, pred_of=pred_of)
        run_ba(reject=reject_outliers)
        run_ba()
    # trajectory-wide re-association: with converged poses the predicted
    # projections are far sharper than the incremental pass's
    # constant-velocity predictions, so frames that drifted or starved
    # mid-chain recover their observations; then refit
    def reassociate():
        for _ in range(2):
            idx, posed, t_sub, v_sub = subset()
            support_all = (v_sub > 0).sum(axis=0) >= 2
            points = tri(
                posed,
                intrinsics_box[0],
                t_sub,
                jnp.asarray(v_sub * support_all[None, :].astype(vis.dtype)),
            )
            changed = False
            for k in range(kf):
                proj, in_front = project(points, pose_of[k])
                coords, ok = _associate_detections(
                    np.array(proj),
                    support_all & np.asarray(in_front),
                    dets_np[k],
                    det_ok_np[k],
                    assoc_radius,
                    desc_cost=_desc_cost(k),
                )
                if ok.sum() > (vis[k] > 0).sum() or (
                    ok.sum() == (vis[k] > 0).sum()
                    and not np.array_equal(ok, vis[k] > 0)
                ):
                    tracks[k] = np.where(ok[:, None], coords, tracks[k])
                    vis[k] = ok.astype(vis.dtype)
                    changed = True
            if not changed:
                break
            run_ba(reject=reject_outliers)
            run_ba()

    reassociate()
    if refine_intrinsics:
        # final BA with the focal free, on THE ASSOCIATION tracks: lets
        # the full sequence correct the bootstrap focal estimate; the
        # refined focal then re-anchors the geometry (re-associate +
        # refit under it — the bootstrap focal error is 10-30%)
        run_ba(free_focal=True)
        reassociate()
        run_ba(free_focal=True)
    final = jnp.stack([pose_of[i] for i in range(kf)])
    if debug_out is not None:
        debug_out["tracks"] = tracks.copy()
        debug_out["vis"] = vis.copy()
        debug_out["intrinsics"] = np.asarray(intrinsics_box[0])
        debug_out["poses"] = np.asarray(final)
        debug_out["bootstrap_start"] = s0
    if return_cost:
        # self-consistency: mean reprojection residual of the associated
        # observations under the final poses/structure/INTRINSICS
        support = (vis > 0).sum(axis=0) >= 2
        vis_eff = vis * support[None, :].astype(vis.dtype)
        points = tri(
            final, intrinsics_box[0], jnp.asarray(tracks), jnp.asarray(vis_eff)
        )
        res = []
        for k in range(kf):
            proj, _ = project(points, final[k])
            r = np.linalg.norm(np.array(proj) - tracks[k], axis=-1)
            res.append(r[vis_eff[k] > 0])
        res = np.concatenate(res) if res else np.asarray([np.inf])
        # PER-FRAME coverage penalty: a frame with fewer than
        # min_pnp_tracks associations is pose-unconstrained — its pose is
        # pure prediction and contributes (misleadingly) ~zero residual.
        # The round-3 selector used a total-coverage penalty, which let a
        # chain that never associated frames far from its bootstrap win
        # on residual alone (measured: cost 0.013 / ATE 10.4 chosen over
        # cost 0.018 / ATE 0.88).
        per_frame = (vis_eff > 0).sum(axis=1)
        deficit = np.maximum(
            0.0, 1.0 - per_frame / max(1, min_pnp_tracks + 1)
        )
        cost = float(np.mean(res)) + 0.1 * float(np.mean(deficit))
        return final, cost
    return final


def solve_learned_vo_incremental(
    guess_fn,
    tracks: jax.Array,
    visibility: jax.Array,
    config: TrajectoryConfig,
    irls_rounds: int = 2,
    refine_intrinsics: bool = True,
    detections: jax.Array | None = None,
    det_scores: jax.Array | None = None,
    window_obs_fn=None,
    num_bootstraps: int = 3,
    pnp_ransac: int = 0,
    chain_passes: int = 1,
    reject_outliers: bool = False,
    ba_irls: int = 0,
    det_descriptors: jax.Array | None = None,
    desc_weight: float = 0.0,
    debug_out: dict | None = None,
) -> jax.Array:
    """Fully-learned incremental VO: bootstrap window + global tracks.

    The learned pieces supply exactly what they are good at — the first
    window's guess+solve gives the gauge, the bootstrap poses, and the
    intrinsics estimate; the front-end's whole-sequence tracks give the
    observations — and :func:`solve_incremental_vo` does the rest with
    well-determined classical steps (PnP + triangulation + BA).

    :param tracks: ``(K, N, 2)`` learned track observations.
    :param visibility: ``(K, N)`` track weights.
    :return: ``(K, 6)`` estimated poses.
    """
    from davo_tpu.camera import (
        calibration_residuals,
        unpack_calibration_parameters,
    )

    w = config.window
    kf = tracks.shape[0]

    def bootstrap(start):
        """Learned guess + geometry-IRLS solve of the window at ``start``:
        returns its frame-relative poses, intrinsics estimate, and the
        (IRLS-reweighted) window observations."""
        if window_obs_fn is not None:
            w_pix, w_vis = window_obs_fn(start)
            w_vis = w_vis.astype(tracks.dtype)
        else:
            w_pix = tracks[start : start + w][None]
            w_vis = visibility[start : start + w].astype(tracks.dtype)[None]
        vec = guess_fn(w_pix, w_vis)[0]
        for _ in range(max(0, irls_rounds)):
            res = calibration_residuals(vec[None], w_pix)[0]
            masked = jnp.where(w_vis[0] > 0, res, jnp.nan)
            scale = jnp.maximum(
                jnp.nan_to_num(jnp.nanpercentile(masked, 70.0), nan=5e-3),
                5e-3,
            )
            huber = jnp.minimum(1.0, scale / jnp.maximum(res, 1e-9))
            w_vis = (w_vis[0] * huber)[None]
            vec = guess_fn(w_pix, w_vis)[0]
        params = unpack_calibration_parameters(vec, w, w_pix.shape[2])
        rel = jnp.concatenate(
            [
                params.camera_rotations[:, 0, :],
                params.camera_translations[:, 0, :],
            ],
            axis=-1,
        )
        boot_est = jnp.concatenate(
            [jnp.zeros((1, 6), rel.dtype), rel], axis=0
        )
        intr = params.intrinsics.reshape(-1)  # (1, 1, 3) -> (3,)
        focal = jax.nn.elu(intr[0]) + 1.0
        intrinsics = jnp.stack(
            [focal, intr[1], intr[2]]
        ).astype(tracks.dtype)
        return boot_est, intrinsics, w_pix[0], w_vis[0]

    if detections is not None:
        # geometric data association over raw detections — identity from
        # the accumulated structure, not from descriptors.  Each learned
        # bootstrap is trimmed to TWO frames (adjacent-view relative pose
        # is the window solve's most reliable output; anchored-track
        # identity errors — measured 25-67% beyond 2 frames — must not
        # seed the accumulator) and the chain runs forward + backward
        # from it.  The 2-frame bootstrap is the single point of failure
        # (a bad window poisons everything downstream), so
        # ``num_bootstraps`` candidate windows are tried and the chain
        # with the lowest self-consistent reprojection cost wins.
        # refine_intrinsics runs INSIDE on the association tracks.
        if num_bootstraps <= 1 or kf <= w:
            starts = [0]
        else:
            starts = sorted(
                {
                    int(s)
                    for s in np.linspace(0, kf - w, num_bootstraps).round()
                }
            )
        best = None
        all_costs = {}
        for s in starts:
            boot_est, intrinsics, b_pix, b_vis = bootstrap(s)
            dbg = {} if debug_out is not None else None
            est, cost = solve_incremental_vo_detections(
                detections,
                det_scores,
                intrinsics,
                boot_est[:2],
                b_pix[:2],
                b_vis[:2],
                refine_intrinsics=refine_intrinsics,
                bootstrap_start=s,
                return_cost=True,
                pnp_ransac=pnp_ransac,
                chain_passes=chain_passes,
                reject_outliers=reject_outliers,
                ba_irls=ba_irls,
                det_descriptors=det_descriptors,
                desc_weight=desc_weight,
                debug_out=dbg,
            )
            all_costs[s] = float(cost)
            if debug_out is not None:
                debug_out.setdefault("candidates", {})[s] = (
                    float(cost),
                    np.asarray(est),
                )
            if best is None or cost < best[0]:
                best = (cost, est, s, dbg)
        if debug_out is not None:
            debug_out.update(best[3] or {})
            debug_out["bootstrap_costs"] = all_costs
            debug_out["chosen_bootstrap"] = best[2]
        return best[1]

    boot_est, intrinsics, _, _ = bootstrap(0)
    estimates = solve_incremental_vo(
        tracks, visibility, intrinsics, boot_est
    )
    if refine_intrinsics:
        # one final BA with the focal free: the bootstrap focal estimate
        # carries the guess head's ~0.1-0.3 error, which PnP bakes into
        # the geometry; freeing it at the end lets the full track set
        # pick the consistent focal
        points = triangulate_points(
            estimates, intrinsics, tracks, visibility
        )
        kf, n = tracks.shape[0], tracks.shape[1]
        masks = (
            jnp.asarray([True, False, False]),
            jnp.ones((kf, 6), dtype=bool).at[0].set(False),
            jnp.ones((n, 3), dtype=bool).at[0, 2].set(False),
        )
        solved = schur_ba_solve(
            BAProblem(
                intrinsics=intrinsics, poses=estimates, points=points
            ),
            BAObservations(
                pixels=tracks,
                visibility=visibility.astype(tracks.dtype),
            ),
            SchurConfig(iterations=15, damping=1e-3),
            gauge_masks=masks,
        )
        estimates = solved.poses
    return estimates


@_full_f32_matmuls
def refine_trajectory_global(
    estimates: jax.Array,
    intrinsics: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
    solver: SchurConfig = SchurConfig(iterations=15, damping=1e-3),
    mesh=None,
    rounds: int = 1,
) -> jax.Array:
    """Global pose refinement: triangulate all points from the stitched
    trajectory and run a full-sequence bundle adjustment (intrinsics
    frozen, frame 0 pinned).  With ``rounds > 1`` the triangulation and BA
    alternate: each round re-triangulates the structure from the freshly
    refined poses, which recovers from stitched trajectories whose
    window-scale drift put the first DLT solution in a poor basin.  With
    ``mesh`` given the point block is sharded
    (:func:`davo_tpu.parallel.distributed_schur_ba`).

    :param estimates: ``(K, 6)`` stitched world->camera poses.
    :return: ``(K, 6)`` refined poses.
    """
    from davo_tpu.parallel import distributed_schur_ba

    kf, n = pixels.shape[0], pixels.shape[1]
    intr_free = jnp.zeros(3, dtype=bool)
    pose_free = jnp.ones((kf, 6), dtype=bool).at[0].set(False)
    point_free = jnp.ones((n, 3), dtype=bool).at[0, 2].set(False)
    masks = (intr_free, pose_free, point_free)
    poses = estimates
    for _ in range(max(1, rounds)):
        points = triangulate_points(poses, intrinsics, pixels, visibility)
        problem = BAProblem(
            intrinsics=intrinsics, poses=poses, points=points
        )
        obs = BAObservations(pixels=pixels, visibility=visibility)
        if mesh is not None:
            solved = distributed_schur_ba(
                problem, obs, mesh, solver, gauge_masks=masks
            )
        else:
            solved = schur_ba_solve(problem, obs, solver, gauge_masks=masks)
        poses = solved.poses
    return poses


def _rescale_segments(estimates: jax.Array, log_s: jax.Array) -> jax.Array:
    """Rescale the camera-centre increments of a trajectory.

    ``c_k(s) = c_0 + sum_{j<k} exp(s_j) (c_{j+1} - c_j)`` with rotations
    unchanged — the deformation family of chained window-scale drift.

    :param estimates: ``(K, 6)`` world->camera poses.
    :param log_s: ``(K-1,)`` per-segment log scales.
    :return: ``(K, 6)`` rescaled poses.
    """
    rot = so3_rotation_matrix(estimates[:, 0:3])  # (K, 3, 3)
    centres = -jnp.einsum("kji,kj->ki", rot, estimates[:, 3:6])
    deltas = centres[1:] - centres[:-1]
    scaled = jnp.exp(log_s)[:, None] * deltas
    new_centres = centres[0] + jnp.concatenate(
        [jnp.zeros((1, 3), estimates.dtype), jnp.cumsum(scaled, axis=0)]
    )
    t = -jnp.einsum("kij,kj->ki", rot, new_centres)
    return jnp.concatenate([estimates[:, 0:3], t], axis=-1)


@_full_f32_matmuls
def refine_trajectory_multistart(
    estimates: jax.Array,
    intrinsics: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
    key: jax.Array,
    num_hypotheses: int = 16,
    modes: int = 4,
    sigma: float = 0.25,
    solver: SchurConfig = SchurConfig(iterations=30, damping=1e-3),
    rounds: int = 2,
) -> jax.Array:
    """Multi-hypothesis global refinement that escapes the stitched-scale
    local-minimum family.

    The measured failure mode of :func:`refine_trajectory_global` is a
    family of local minima created by accumulated window-scale drift (a
    *low-frequency* deformation of the camera-centre polyline — see
    :func:`correct_scale_drift`).  This pass spans that family explicitly:
    the stitched trajectory is perturbed along ``modes`` low-order cosine
    modes of per-segment log-scale (hypothesis 0 is unperturbed), every
    hypothesis is refined by alternating DLT triangulation + Schur BA in
    one vmapped batch (TPU-friendly: identical shapes, no control flow),
    and the hypothesis with the lowest final reprojection cost wins — on
    the oracle-match sequences the cost floor at the true geometry is ~0,
    so cost is a sound selector.

    :param estimates: ``(K, 6)`` stitched world->camera poses.
    :return: ``(K, 6)`` refined poses of the best-cost hypothesis.
    """
    kf, n = pixels.shape[0], pixels.shape[1]
    seg = jnp.arange(kf - 1, dtype=estimates.dtype)
    basis = jnp.stack(
        [
            jnp.cos(jnp.pi * (m + 1) * (seg + 0.5) / (kf - 1))
            for m in range(modes)
        ]
    )  # (modes, K-1)
    coeffs = sigma * jax.random.normal(
        key, (num_hypotheses - 1, modes), estimates.dtype
    )
    log_s = jnp.concatenate(
        [jnp.zeros((1, kf - 1), estimates.dtype), coeffs @ basis]
    )
    starts = jax.vmap(lambda ls: _rescale_segments(estimates, ls))(log_s)

    intr_free = jnp.zeros(3, dtype=bool)
    pose_free = jnp.ones((kf, 6), dtype=bool).at[0].set(False)
    point_free = jnp.ones((n, 3), dtype=bool).at[0, 2].set(False)
    masks = (intr_free, pose_free, point_free)
    obs = BAObservations(pixels=pixels, visibility=visibility)

    def refine_one(start):
        poses = start
        for _ in range(max(1, rounds)):
            points = triangulate_points(poses, intrinsics, pixels, visibility)
            solved = schur_ba_solve(
                BAProblem(intrinsics=intrinsics, poses=poses, points=points),
                obs,
                solver,
                gauge_masks=masks,
            )
            poses = solved.poses
        points = triangulate_points(poses, intrinsics, pixels, visibility)
        cost = ba_cost(
            BAProblem(intrinsics=intrinsics, poses=poses, points=points),
            obs,
            solver,
        )
        return poses, cost

    poses_all, costs = jax.vmap(refine_one)(starts)
    return poses_all[jnp.argmin(costs)]


@_full_f32_matmuls
def correct_scale_drift(
    estimates: jax.Array,
    intrinsics: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
    iterations: int = 30,
) -> jax.Array:
    """Remove accumulated window-scale drift from a stitched trajectory.

    Chained-window stitching fixes each window's gauge scale from a single
    shared frame pair, so scale errors compound along the sequence; the
    resulting deformation is a *low-frequency* error mode that full bundle
    adjustment gets stuck next to (a measured local minimum: the refined
    f64 cost plateaus 2-3x above the true-geometry floor while ATE stays
    ~0.06).  This pass optimises exactly those modes and nothing else:
    per-segment log-scales ``s_k`` of the camera-centre increments,

        c_k(s) = c_0 + sum_{j<k} exp(s_j) (c_{j+1} - c_j),

    with rotations fixed, scored by the reprojection cost of a DLT
    triangulation at the rescaled poses (the triangulation is a
    ``jnp.linalg.solve`` — differentiable end to end), minimised with the
    batched BFGS solver.  A (K-1)-dimensional smooth problem, so the full
    solver budget costs microseconds.

    :param estimates: ``(K, 6)`` stitched world->camera poses.
    :return: ``(K, 6)`` poses with corrected per-segment scales.
    """
    from davo_tpu.solve import BFGSConfig, bfgs_solve

    kf = estimates.shape[0]
    vis = visibility.astype(pixels.dtype)

    def poses_from_logscale(log_s):
        return _rescale_segments(estimates, log_s)

    def cost(log_s_batch):
        def one(log_s):
            poses = poses_from_logscale(log_s)
            points = triangulate_points(poses, intrinsics, pixels, visibility)
            rmat = so3_rotation_matrix(poses[:, 0:3])
            rel = (
                jnp.einsum("kij,nj->kni", rmat, points)
                + poses[:, None, 3:6]
            )
            z = jnp.maximum(rel[..., 2], 1e-3)
            u = intrinsics[0] * rel[..., 0] / z + intrinsics[1]
            v = intrinsics[0] * rel[..., 1] / z + intrinsics[2]
            r = (jnp.stack([u, v], -1) - pixels) * vis[..., None]
            return jnp.sum(jnp.square(r))

        return jax.vmap(one)(log_s_batch)

    init = jnp.zeros((1, kf - 1), estimates.dtype)
    solved = bfgs_solve(
        cost,
        init,
        BFGSConfig(
            iterations=iterations,
            error_threshold=0.0,
            minimum_step=1e-12,
            drop_path_p=0.0,
            line_search_iterations=20,
        ),
    )
    return poses_from_logscale(solved[0])


@_full_f32_matmuls
def refine_trajectory_host_f64(
    estimates: jax.Array,
    intrinsics: jax.Array,
    pixels: jax.Array,
    visibility: jax.Array,
    solver: SchurConfig = SchurConfig(iterations=30, damping=1e-6),
    rounds: int = 2,
) -> jax.Array:
    """Final float64 *host polish* of a refined trajectory.

    TPUs have no native f64; the on-chip Schur BA and the DLT
    triangulation both form normal equations, so their accuracy floor is
    ~sqrt(f32 eps) — measured as an ATE plateau around 0.06 on the
    synthetic orbit sequences even though the f32 cost has already reached
    the true-geometry cost floor.  The global pose system is tiny (K poses
    x N points), so one more :func:`refine_trajectory_global` in float64
    on the host CPU removes the precision floor at negligible cost.  This
    mirrors the reference's fp64 configs
    (``configurations/bfgs_solver_full_gradient_config.yaml``): f32 for
    the heavy batched work, f64 where conditioning demands it.

    :param estimates: ``(K, 6)`` already-refined world->camera poses.
    :return: ``(K, 6)`` polished poses, in the input dtype.
    """
    cpu = jax.devices("cpu")[0]
    in_dtype = estimates.dtype
    with jax.enable_x64():
        with jax.default_device(cpu):
            est64 = jnp.asarray(jax.device_get(estimates), jnp.float64)
            intr64 = jnp.asarray(jax.device_get(intrinsics), jnp.float64)
            pix64 = jnp.asarray(jax.device_get(pixels), jnp.float64)
            vis64 = jnp.asarray(jax.device_get(visibility))
            polished = refine_trajectory_global(
                est64, intr64, pix64, vis64, solver=solver, rounds=rounds
            )
            polished = jax.device_get(polished)
    return jnp.asarray(polished, in_dtype)


def evaluate_learned_vo(
    guess_fn,
    key: jax.Array,
    config: TrajectoryConfig = TrajectoryConfig(),
    refine: bool = False,
    mesh=None,
    refine_rounds: int = 1,
    host_polish: bool = False,
    multistart: int = 0,
    stitch: str = "global",
    frontend_fn=None,
    render_config=None,
    track_fn=None,
    irls_rounds: int = 0,
    pipeline: str = "windows",
    detections_fn=None,
    pnp_ransac: int = 0,
    chain_passes: int = 1,
    reject_outliers: bool = False,
    ba_irls: int = 0,
    num_bootstraps: int = 3,
    descriptors_fn=None,
    desc_weight: float = 0.0,
    debug_out: dict | None = None,
) -> Dict[str, jax.Array]:
    """Generate a sequence, run the full learned VO (optionally followed by
    global BA refinement — single-start or ``multistart`` scale-mode
    hypotheses — and a float64 host polish), report aligned ATE.

    With ``frontend_fn`` the pipeline is fully image-based: the sequence
    is rendered (:func:`render_trajectory_images`), every window's
    observations come from the visual front-end, and the refinement stage
    consumes *learned global tracks* (the front-end applied to the whole
    sequence as one window, anchor = frame 0) — the oracle projections
    never reach the solver."""
    # scene generation keeps the caller's key unchanged so results stay
    # comparable with the single-start eval path; hypotheses fold in
    k_hyp = jax.random.fold_in(key, 7)
    poses, _, pixels, visibility = generate_trajectory(key, config)
    images = None
    if frontend_fn is not None:
        images = render_trajectory_images(
            pixels, visibility, jax.random.fold_in(key, 11), render_config
        )
        # learned global tracks replace the oracle observations everywhere
        # downstream (refinement, multistart scoring); the refinement stage
        # has no fixed-N constraint, so ``track_fn`` may select more (wider)
        # tracks than the per-window guess network consumes
        tracks, track_vis = (track_fn or frontend_fn)(images[None])
        pixels = tracks[0]
        visibility = track_vis[0]
    if pipeline == "incremental":
        # tracks (learned when frontend_fn given, else oracle) feed the
        # PnP/triangulation/BA accumulator — per-window solves are only
        # used to bootstrap the first window
        detections = det_scores = None
        det_descriptors = None
        window_obs_fn = None
        if detections_fn is not None and images is not None:
            dets, dscores = detections_fn(images[None])
            detections, det_scores = dets[0], dscores[0]
            if descriptors_fn is not None and desc_weight > 0.0:
                det_descriptors = descriptors_fn(images[None])[0]
        if frontend_fn is not None and images is not None:
            # candidate bootstrap windows are matched FRESH with their own
            # anchor frame (identity within one window is reliable; the
            # whole-sequence anchored tracks are not)
            def window_obs_fn(s):
                return frontend_fn(images[s : s + config.window][None])
        estimates = solve_learned_vo_incremental(
            guess_fn,
            pixels,
            visibility.astype(pixels.dtype),
            config,
            irls_rounds=max(irls_rounds, 2),
            detections=detections,
            det_scores=det_scores,
            window_obs_fn=window_obs_fn,
            pnp_ransac=pnp_ransac,
            chain_passes=chain_passes,
            reject_outliers=reject_outliers,
            ba_irls=ba_irls,
            num_bootstraps=num_bootstraps,
            det_descriptors=det_descriptors,
            desc_weight=desc_weight,
            debug_out=debug_out,
        )
    elif pipeline == "windows":
        estimates = solve_windowed_vo_learned(
            guess_fn,
            pixels,
            visibility,
            config,
            stitch=stitch,
            images=images,
            frontend_fn=frontend_fn,
            irls_rounds=irls_rounds,
        )
    else:
        raise ValueError(f"unknown pipeline {pipeline!r}")
    intrinsics = jnp.asarray([config.focal_length, 0.0, 0.0])
    if multistart > 0:
        estimates = refine_trajectory_multistart(
            estimates,
            intrinsics,
            pixels,
            visibility,
            k_hyp,
            num_hypotheses=multistart,
            rounds=max(2, refine_rounds),
        )
    elif refine:
        estimates = refine_trajectory_global(
            estimates,
            intrinsics,
            pixels,
            visibility,
            mesh=mesh,
            rounds=refine_rounds,
        )
    if host_polish:
        estimates = refine_trajectory_host_f64(
            estimates, intrinsics, pixels, visibility
        )
    est_centres = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_centres = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    return absolute_trajectory_error(est_centres, true_centres)


@_full_f32_matmuls
def observations_for_poses(
    poses: jax.Array,
    intrinsics: jax.Array,
    key: jax.Array,
    num_points: int = 32,
    depth_scale: float = 10.0,
    pixel_noise: float = 0.0,
):
    """Synthesize landmark observations along an arbitrary camera path.

    Real trajectory files carry no tracked features; this places SLAM-like
    landmarks ahead of evenly-spaced anchor frames (each point sits in
    front of *some* camera, so every window of the sequence sees the
    landmarks anchored near it — forward-motion KITTI paths work as well
    as orbits) and projects them through all frames.

    :param poses: ``(K, 6)`` world->camera.
    :param intrinsics: ``(3,)`` ``(f, cx, cy)``.
    :return: ``(points (N, 3), pixels (K, N, 2), visibility (K, N))``.
    """
    kf = poses.shape[0]
    rot = so3_rotation_matrix(poses[:, 0:3])  # (K, 3, 3)
    centres = -jnp.einsum("kji,kj->ki", rot, poses[:, 3:6])
    forward = rot[:, 2, :]  # camera z-axis in world coords
    step = jnp.median(
        jnp.linalg.norm(centres[1:] - centres[:-1], axis=-1)
    )
    depth = depth_scale * jnp.maximum(step, 1e-3)
    anchor = jnp.round(
        jnp.linspace(0.0, kf - 1.0, num_points)
    ).astype(jnp.int32)
    k_d, k_s = jax.random.split(key)
    depths = depth * jax.random.uniform(
        k_d, (num_points, 1), poses.dtype, 0.7, 1.6
    )
    scatter = 0.35 * depth * jax.random.normal(
        k_s, (num_points, 3), poses.dtype
    )
    points = centres[anchor] + forward[anchor] * depths + scatter

    rel = jnp.einsum("kij,nj->kni", rot, points) + poses[:, None, 3:6]
    z = jnp.maximum(rel[..., 2], 1e-8)
    f, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2]
    u = f * rel[..., 0] / z + cx
    v = f * rel[..., 1] / z + cy
    pixels = jnp.stack([u, v], axis=-1)
    if pixel_noise > 0.0:
        pixels = pixels + pixel_noise * jax.random.normal(
            jax.random.fold_in(key, 2), pixels.shape, poses.dtype
        )
    visibility = (
        (jnp.abs(u) < 1.0)
        & (jnp.abs(v) < 1.0)
        & (rel[..., 2] > 0.05 * depth)
    )
    return points, pixels, visibility


def evaluate_vo_sequence_file(
    path: str,
    format: str = "tum",
    config: TrajectoryConfig = TrajectoryConfig(),
    key: jax.Array | None = None,
    intrinsics: jax.Array | None = None,
    max_frames: int | None = None,
    num_points: int | None = None,
    guess_fn=None,
    frontend_fn=None,
    render_config=None,
    stitch: str = "global",
    pipeline: str = "windows",
    detections_fn=None,
) -> Dict[str, jax.Array]:
    """Windowed VO along a trajectory **loaded from a file** (TUM/KITTI).

    The ground-truth motion comes from the file; landmark observations are
    synthesized along it (:func:`observations_for_poses` — no real images
    are shipped with trajectory benchmarks).  Reports aligned ATE plus
    drift-local RPE at delta = 1 frame.

    Two solver paths:

    * default (oracle observations): per-window BFGS with the known
      intrinsics, overlap-consistent stitching (:func:`solve_windowed_vo`);
    * **learned, from pixels** (``guess_fn`` given): the synthesized
      observations are *rendered* to frames
      (:func:`render_trajectory_images`) and, with ``frontend_fn``, every
      window's observations come from the visual front-end (detector +
      attention matcher) run on those images — real motion from the file,
      end-to-end learned everything else.  ``guess_fn`` alone runs the
      learned guess+solve on the oracle observations.
    """
    from davo_tpu.data.sequences import load_sequence
    from .evaluation import relative_pose_error

    if key is None:
        key = jax.random.key(0)
    seq = load_sequence(path, format)
    poses = seq.poses
    if max_frames is not None:
        poses = poses[:max_frames]
    kf = poses.shape[0]
    if kf < config.window:
        raise ValueError(
            f"sequence has {kf} frames < window {config.window}"
        )
    if intrinsics is None:
        intrinsics = (
            seq.intrinsics
            if seq.intrinsics is not None
            else jnp.asarray([config.focal_length, 0.0, 0.0], poses.dtype)
        )
    n = num_points if num_points is not None else config.num_points
    k_obs, k_solve = jax.random.split(key)
    points, pixels, visibility = observations_for_poses(
        poses, intrinsics, k_obs, num_points=n
    )
    seq_config = dataclasses.replace(
        config, num_frames=kf, num_points=n,
        focal_length=float(intrinsics[0]),
    )
    if guess_fn is not None:
        images = None
        if frontend_fn is not None:
            images = render_trajectory_images(
                pixels, visibility, jax.random.fold_in(key, 11), render_config
            )
        if pipeline == "incremental":
            detections = det_scores = None
            obs_pixels = pixels
            obs_vis = visibility.astype(pixels.dtype)
            window_obs_fn = None
            if frontend_fn is not None:
                tr, tv = frontend_fn(images[None])
                obs_pixels, obs_vis = tr[0], tv[0].astype(pixels.dtype)

                def window_obs_fn(s):
                    return frontend_fn(
                        images[s : s + seq_config.window][None]
                    )

                if detections_fn is not None:
                    dts, dsc = detections_fn(images[None])
                    detections, det_scores = dts[0], dsc[0]
            estimates = solve_learned_vo_incremental(
                guess_fn,
                obs_pixels,
                obs_vis,
                seq_config,
                detections=detections,
                det_scores=det_scores,
                window_obs_fn=window_obs_fn,
            )
        else:
            estimates = solve_windowed_vo_learned(
                guess_fn,
                pixels,
                visibility,
                seq_config,
                stitch=stitch,
                images=images,
                frontend_fn=frontend_fn,
            )
    else:
        estimates = solve_windowed_vo(
            poses, points, pixels, visibility, seq_config, k_solve,
            intrinsics=jnp.asarray(intrinsics, poses.dtype),
        )
    est_centres = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_centres = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    metrics = absolute_trajectory_error(est_centres, true_centres)
    metrics.update(
        {
            f"rpe_{name}": value
            for name, value in relative_pose_error(estimates, poses).items()
        }
    )
    metrics["num_frames"] = jnp.asarray(kf)
    return metrics


def evaluate_vo(
    key: jax.Array, config: TrajectoryConfig = TrajectoryConfig()
) -> Dict[str, jax.Array]:
    """Full pipeline: generate a sequence, run windowed VO, report ATE."""
    k_scene, k_solve = jax.random.split(key)
    poses, points, pixels, visibility = generate_trajectory(k_scene, config)
    estimates = solve_windowed_vo(
        poses, points, pixels, visibility, config, k_solve
    )
    est_centres = camera_centers_from_poses(estimates[:, 0:3], estimates[:, 3:6])
    true_centres = camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    return absolute_trajectory_error(est_centres, true_centres)
