"""Hard-seed study: the learned incremental-VO tail (trials 2/3 = seeds
102/103, VERDICT r3 item 1) and the f32-vs-x64 gap (item 2).

Reproduces the OFFICIAL eval configuration (cli vo-eval --pipeline
incremental --association geometric --matches learned, v6 guess +
frontend v2) per trial, with:

- fix toggles:   PNP_RANSAC=<n>  CHAIN_PASSES=<n>
- dtype toggles: X64=1 (CPU float64)  |  default f32
- platform:      PLATFORM=cpu (default) | axon (TPU)
- trial list:    TRIALS=0,1,2,3

and prints per-trial: ATE stats, chosen bootstrap + per-bootstrap costs,
per-frame aligned position error, and association correctness vs the
oracle projections (fraction of associated observations within 0.05 of
the oracle projection of the track's anchor-assigned point).

Run: PLATFORM=cpu TRIALS=2,3 PNP_RANSAC=12 CHAIN_PASSES=2 \
     timeout 3600 python -u scripts/hardseed_study.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

PLATFORM = os.environ.get("PLATFORM", "cpu")
jax.config.update("jax_platforms", PLATFORM)
if os.environ.get("X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)

import dataclasses
import pickle

import jax.numpy as jnp
import numpy as np

from davo_tpu.data.rendering import RenderConfig
from davo_tpu.models import VOFrontend
from davo_tpu.train import get_preset, restore_checkpoint
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
    umeyama_alignment,
)
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    evaluate_learned_vo,
    generate_trajectory,
)

GUESS_PKL = os.environ.get(
    "GUESS_PKL", "artifacts/vo_windows_transformer_v6_verified.pkl"
)
FRONTEND_DIR = os.environ.get("FRONTEND_DIR", "artifacts/ckpt_frontend_v2")
TRIALS = [int(t) for t in os.environ.get("TRIALS", "0,1,2,3").split(",")]
PNP_RANSAC = int(os.environ.get("PNP_RANSAC", "0"))
CHAIN_PASSES = int(os.environ.get("CHAIN_PASSES", "1"))
REJECT = os.environ.get("REJECT", "0") == "1"
NUM_BOOTSTRAPS = int(os.environ.get("BOOTSTRAPS", "3"))
BA_IRLS = int(os.environ.get("BA_IRLS", "0"))
DESC_WEIGHT = float(os.environ.get("DESC_WEIGHT", "0"))
VERBOSE = os.environ.get("VERBOSE", "1") == "1"


def build_fns():
    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=4,
        num_points=8,
        num_restarts=8,
        selection="error",
        basin_anchor_weight=0.0,
        hidden_size=384,
        transformer_layers=8,
        transformer_heads=8,
    )
    net = net_cfg.build_network()
    with open(GUESS_PKL, "rb") as f:
        restored = pickle.load(f)
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    @jax.jit
    def guess_fn(pw, vw):
        return net.apply(variables, pw, vw)

    arch_path = os.path.join(FRONTEND_DIR, "frontend_config.json")
    arch = {}
    if os.path.exists(arch_path):
        arch = json.load(open(arch_path))
    image_size = arch.pop("image_size", 64)
    render_config = RenderConfig(image_size=image_size)
    frontend_net = VOFrontend(
        num_select=arch.get("num_select", 8),
        descriptor_channels=arch.get("descriptor_channels", 64),
        embedding_size=arch.get("embedding_size", 64),
        match_confidence_threshold=0.0,
        nms_radius=0.1,
        snap_radius=0.12,
        cycle_threshold=0.15,
        quality_bonus=10.0,
        score_threshold=0.2,
        centroid_refine_iters=2,
        soft_gate_floor=0.0,
    )
    fe_restored = restore_checkpoint(FRONTEND_DIR)
    fe_vars = {
        "params": fe_restored["params"],
        "batch_stats": fe_restored.get("batch_stats", {}),
    }

    @jax.jit
    def frontend_fn(images):
        out = frontend_net.apply(fe_vars, images)
        return out.matches, out.match_visibility

    @jax.jit
    def detections_fn(images):
        out = frontend_net.apply(fe_vars, images)
        return out.points, jax.nn.sigmoid(out.scores)

    from davo_tpu.models.vo_frontend import frontend_detect

    @jax.jit
    def descriptors_fn(images):
        return frontend_detect(frontend_net, fe_vars, images)[2]

    return guess_fn, frontend_fn, detections_fn, descriptors_fn, render_config


def association_report(key, tcfg, debug):
    """Fraction of associated observations landing on the oracle
    projection of the point each track locked onto in its best frame."""
    poses, points, o_pix, o_vis = generate_trajectory(key, tcfg)
    o_pix, o_vis = np.asarray(o_pix), np.asarray(o_vis)
    tracks, vis = debug["tracks"], debug["vis"]
    kf, n = vis.shape
    # assign each track an oracle point id by majority vote of nearest
    # visible oracle projections over its observations
    votes = np.full((n, o_pix.shape[1]), 0)
    for k in range(kf):
        for t in range(n):
            if vis[k, t] <= 0:
                continue
            d = np.linalg.norm(o_pix[k] - tracks[k, t], axis=-1)
            d[~o_vis[k]] = np.inf
            j = int(np.argmin(d))
            if np.isfinite(d[j]) and d[j] < 0.05:
                votes[t, j] += 1
    owner = votes.argmax(axis=1)
    ok_frac = np.zeros(kf)
    counts = np.zeros(kf)
    for k in range(kf):
        t_vis = vis[k] > 0
        counts[k] = t_vis.sum()
        if counts[k] == 0:
            continue
        d_owner = np.linalg.norm(
            o_pix[k, owner] - tracks[k], axis=-1
        )
        ok = (d_owner < 0.05) & t_vis
        ok_frac[k] = ok.sum() / counts[k]
    return ok_frac, counts


def per_frame_error(key, tcfg, est):
    poses, _, _, _ = generate_trajectory(key, tcfg)
    est_c = np.asarray(
        camera_centers_from_poses(est[:, 0:3], est[:, 3:6])
    )
    true_c = np.asarray(
        camera_centers_from_poses(poses[:, 0:3], poses[:, 3:6])
    )
    rot, t, s = umeyama_alignment(
        jnp.asarray(est_c), jnp.asarray(true_c), True
    )
    aligned = s * est_c @ np.asarray(rot).T + np.asarray(t)
    return np.linalg.norm(aligned - true_c, axis=-1)


def main():
    guess_fn, frontend_fn, detections_fn, descriptors_fn, render_config = build_fns()
    tcfg = TrajectoryConfig(num_frames=16, num_points=8, window=4, stride=0)
    print(
        json.dumps(
            {
                "platform": PLATFORM,
                "x64": jax.config.jax_enable_x64,
                "pnp_ransac": PNP_RANSAC,
                "chain_passes": CHAIN_PASSES,
                "reject": REJECT, "ba_irls": BA_IRLS, "desc_weight": DESC_WEIGHT,
                "trials": TRIALS,
            }
        ),
        flush=True,
    )
    results = []
    for trial in TRIALS:
        key = jax.random.key(100 + trial)
        debug = {}
        ate = evaluate_learned_vo(
            guess_fn,
            key,
            tcfg,
            refine=False,
            frontend_fn=frontend_fn,
            render_config=render_config,
            pipeline="incremental",
            detections_fn=detections_fn,
            pnp_ransac=PNP_RANSAC,
            chain_passes=CHAIN_PASSES,
            reject_outliers=REJECT,
            ba_irls=BA_IRLS,
            num_bootstraps=NUM_BOOTSTRAPS,
            descriptors_fn=descriptors_fn,
            desc_weight=DESC_WEIGHT,
            debug_out=debug,
        )
        ate = {k: float(v) for k, v in ate.items()}
        results.append(ate)
        print(json.dumps({"trial": trial, **ate}), flush=True)
        if VERBOSE and "candidates" in debug:
            cand = {
                s2: (c, round(float(per_frame_error(key, tcfg,
                     jnp.asarray(e)).__pow__(2).mean() ** 0.5), 3))
                for s2, (c, e) in sorted(debug["candidates"].items())
            }
            print(json.dumps({"trial": trial, "cand_cost_ate": {
                str(k): [round(v[0], 5), v[1]] for k, v in cand.items()
            }}), flush=True)
        if VERBOSE and "poses" in debug:
            est = jnp.asarray(debug["poses"])
            pfe = per_frame_error(key, tcfg, est)
            ok_frac, counts = association_report(key, tcfg, debug)
            print(
                json.dumps(
                    {
                        "trial": trial,
                        "chosen_bootstrap": debug.get("chosen_bootstrap"),
                        "bootstrap_costs": debug.get("bootstrap_costs"),
                        "intrinsics": [
                            round(float(x), 4)
                            for x in debug.get("intrinsics", [])
                        ],
                        "per_frame_err": [round(float(e), 3) for e in pfe],
                        "assoc_ok_frac": [
                            round(float(f), 2) for f in ok_frac
                        ],
                        "assoc_counts": [int(c) for c in counts],
                    }
                ),
                flush=True,
            )
    mean_rmse = sum(r["rmse"] for r in results) / len(results)
    print(json.dumps({"mean_ate_rmse": round(mean_rmse, 6)}), flush=True)


if __name__ == "__main__":
    main()
