"""Diagnose the learned-matches VO failure (round-2: refined ATE ~8 vs
oracle ~5e-6).

Measures, on the exact eval distribution (TrajectoryConfig, trial key
100), each stage of the learned pipeline in isolation, for a list of
front-end verification configs:

1. match-quality stats per window: distance of every solver-facing match
   to the nearest visible oracle projection in its view (percentiles),
   surviving (gated) observation counts per view, and cross-view
   assignment consistency (does the match in view m correspond to the
   SAME oracle point as the anchor feature?);
2. window-solve quality: the guess+solve network run on oracle vs
   learned observations of the SAME windows — relative-pose rotation
   errors per window.

Run (CPU, minutes): python -u scripts/diagnose_learned_matches.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import pickle

import jax.numpy as jnp
import numpy as np

from davo_tpu.data.rendering import RenderConfig
from davo_tpu.models import VOFrontend
from davo_tpu.train import get_preset, restore_checkpoint
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    generate_trajectory,
    render_trajectory_images,
    _window_starts,
)
from davo_tpu.camera import unpack_calibration_parameters
from davo_tpu.geometry import so3_rotation_matrix

import os as _os

FRONTEND_DIR = _os.environ.get("FRONTEND_DIR", "artifacts/ckpt_frontend_v2")
GUESS_PKL = _os.environ.get(
    "GUESS_PKL", "artifacts/vo_windows_transformer_v3_1200.pkl"
)

CONFIGS = {
    "verify(scene8)": dict(
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.08,
        cycle_threshold=0.08, quality_bonus=10.0, score_threshold=0.5,
    ),
    "verify(scene24)": dict(
        scene24=True,
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.08,
        cycle_threshold=0.08, quality_bonus=10.0, score_threshold=0.5,
    ),
    "verify(scene24,relaxed)": dict(
        scene24=True,
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.08,
        cycle_threshold=0.08, quality_bonus=10.0, score_threshold=0.3,
    ),
    "verify(scene8,relaxed)": dict(
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.12,
        cycle_threshold=0.15, quality_bonus=10.0, score_threshold=0.2,
    ),
    "ungated(scene8,centroid)": dict(
        nms_radius=0.1, centroid_refine_iters=2,
    ),
    "softgate(scene8,floor0.3)": dict(
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.08,
        cycle_threshold=0.08, quality_bonus=10.0, score_threshold=0.5,
        soft_gate_floor=0.3,
    ),
    "softgate(scene8,floor0.15)": dict(
        nms_radius=0.1, centroid_refine_iters=2, snap_radius=0.08,
        cycle_threshold=0.08, quality_bonus=10.0, score_threshold=0.5,
        soft_gate_floor=0.15,
    ),
}


def pct(x, qs=(10, 50, 90, 99)):
    x = np.asarray(x)
    if x.size == 0:
        return {}
    return {f"p{q}": round(float(np.percentile(x, q)), 4) for q in qs}


def main():
    arch = json.load(open(os.path.join(FRONTEND_DIR, "frontend_config.json")))
    image_size = arch.pop("image_size", 64)
    render_config = RenderConfig(image_size=image_size)
    fe_restored = restore_checkpoint(FRONTEND_DIR)
    fe_vars = {
        "params": fe_restored["params"],
        "batch_stats": fe_restored.get("batch_stats", {}),
    }

    tcfg = TrajectoryConfig(num_frames=16, num_points=8, window=4)
    key = jax.random.key(100)  # same as vo-eval trial 0
    poses, points, pixels, visibility = generate_trajectory(key, tcfg)
    images = render_trajectory_images(
        pixels, visibility, jax.random.fold_in(key, 11), render_config
    )
    starts = _window_starts(tcfg.num_frames, tcfg.window, tcfg.window - 2)

    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=tcfg.window,
        num_points=tcfg.num_points,
        num_restarts=8,
        hidden_size=384,
        transformer_layers=8,
        transformer_heads=8,
    )
    net = net_cfg.build_network()
    restored = pickle.load(open(GUESS_PKL, "rb"))
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    @jax.jit
    def guess_fn(pw, vw):
        return net.apply(variables, pw, vw)

    def window_rot_errors(vec, s, n_obs=None, true_poses=None):
        params = unpack_calibration_parameters(
            vec, tcfg.window, n_obs or tcfg.num_points
        )
        rel_rot = so3_rotation_matrix(params.camera_rotations[:, 0, :])
        idx = np.arange(s, s + tcfg.window)
        rw = so3_rotation_matrix(
            (poses if true_poses is None else true_poses)[idx, 0:3]
        )
        rel_true = jnp.einsum("mij,kj->mik", rw[1:], rw[0])  # R_m R_0^T
        tr = jnp.einsum("mij,mij->m", rel_rot, rel_true)
        ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1)))
        return np.asarray(ang)

    # oracle window solves (config-independent reference)
    angs = []
    for s in starts:
        idx = jnp.arange(s, s + tcfg.window)
        vec = guess_fn(pixels[idx][None], visibility[idx][None])[0]
        angs.append(window_rot_errors(vec, int(s)))
    print(
        "window rotation error deg [oracle]:",
        pct(np.stack(angs).ravel(), (50, 90, 100)),
    )

    # scene-24 variant: more landmarks than solver slots, best-8 selection
    tcfg24 = dataclasses.replace(tcfg, num_points=24)
    poses24, _, pixels24, visibility24 = generate_trajectory(key, tcfg24)
    images24 = render_trajectory_images(
        pixels24, visibility24, jax.random.fold_in(key, 11), render_config
    )

    for label, kw in CONFIGS.items():
        scene24 = kw.pop("scene24", False)
        s_poses, s_pixels, s_vis, s_images = (
            (poses24, pixels24, visibility24, images24)
            if scene24
            else (poses, pixels, visibility, images)
        )
        fe = VOFrontend(
            num_select=arch.get("num_select", 8),
            descriptor_channels=arch.get("descriptor_channels", 64),
            embedding_size=arch.get("embedding_size", 64),
            **kw,
        )

        @jax.jit
        def frontend_fn(images):
            out = fe.apply(fe_vars, images)
            return out.matches, out.match_visibility

        all_near, all_wrong, vis_counts, angs = [], [], [], []
        for s in starts:
            idx = jnp.arange(s, s + tcfg.window)
            matches, mvis = frontend_fn(s_images[idx][None])
            matches = np.asarray(matches[0])
            mvis = np.asarray(mvis[0])
            proj = np.asarray(s_pixels[idx])
            pvis = np.asarray(s_vis[idx])
            d = np.linalg.norm(
                matches[:, :, None, :] - proj[:, None, :, :], axis=-1
            )
            d = np.where(pvis[:, None, :] > 0, d, np.inf)
            near = d.min(axis=-1)
            assign = d.argmin(axis=-1)
            consistent = assign == assign[0][None, :]
            all_near.append(near[mvis > 0])
            all_wrong.append((~consistent)[mvis > 0])
            vis_counts.append(mvis.sum(axis=1))
            w_vis = jnp.asarray(mvis, jnp.float32)[None]
            w_pix = jnp.asarray(matches)[None]
            vec = guess_fn(w_pix, w_vis)[0]
            for _ in range(int(os.environ.get("IRLS", "0"))):
                from davo_tpu.camera import calibration_residuals

                res = calibration_residuals(vec[None], w_pix)[0]
                masked = np.where(np.asarray(mvis) > 0, np.asarray(res), np.nan)
                scale = max(float(np.nanpercentile(masked, 70.0)), 5e-3)
                huber = jnp.minimum(1.0, scale / jnp.maximum(res, 1e-9))
                w_vis = (w_vis[0] * huber)[None]
                vec = guess_fn(w_pix, w_vis)[0]
            angs.append(
                window_rot_errors(
                    vec, int(s), n_obs=mvis.shape[1], true_poses=s_poses
                )
            )

        near = np.concatenate(all_near)
        wrong = np.concatenate(all_wrong)
        print(f"--- {label}")
        print("  match nearest-oracle distance:", pct(near))
        print(
            "  outliers(>0.09):",
            round(float((near > 0.09).mean()), 4),
            " wrong-assignment:",
            round(float(wrong.mean()), 4),
        )
        print(
            "  surviving matches/view (of 8): mean",
            np.round(np.stack(vis_counts).mean(axis=0), 2).tolist(),
        )
        print(
            "  window rotation error deg:",
            pct(np.stack(angs).ravel(), (50, 90, 100)),
        )
        # sparsity-ceiling probe: ORACLE pixels with this config's GATED
        # visibility pattern — separates match-noise/outliers from
        # under-constraint (DOF arithmetic: a gated window has ~2*sum(vis)
        # observations against 45-7 free DOF)
        sp_angs = []
        for wi, s in enumerate(starts):
            idx = jnp.arange(s, s + tcfg.window)
            matches, mvis = frontend_fn(s_images[idx][None])
            proj = jnp.asarray(s_pixels[idx])[None]
            if proj.shape[2] != mvis.shape[2]:
                break  # scene24: oracle N differs from match slots
            vec = guess_fn(proj, mvis.astype(proj.dtype))[0]
            sp_angs.append(
                window_rot_errors(
                    vec, int(s), n_obs=mvis.shape[2], true_poses=s_poses
                )
            )
        if sp_angs:
            print(
                "  [oracle pixels x gated visibility] rot err deg:",
                pct(np.stack(sp_angs).ravel(), (50, 90, 100)),
            )


if __name__ == "__main__":
    main()
