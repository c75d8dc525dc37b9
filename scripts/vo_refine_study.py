"""Diagnose the learned-VO global-refinement ATE floor (~0.06).

With zero pixel noise the global BA objective has a zero-cost global
minimum at the true geometry, so the final weighted cost tells local-min
trapping apart from iteration starvation.  Compares refinement recipes on
the stitched learned-VO trajectories.

Run: timeout 3000 python -u scripts/vo_refine_study.py
"""

import dataclasses
import json
import pickle
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.parallel import (
    BAObservations,
    BAProblem,
    SchurConfig,
    schur_ba_solve,
)
from davo_tpu.parallel.schur import _weighted_cost
from davo_tpu.train import get_preset
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
)
from davo_tpu.train.vo_eval import (
    correct_scale_drift,
    refine_trajectory_host_f64,
    TrajectoryConfig,
    generate_trajectory,
    refine_trajectory_global,
    solve_windowed_vo_learned,
    triangulate_points,
)

CKPT = "artifacts/vo_windows_transformer_v2_600.pkl"


def main():
    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=4,
        num_points=8,
        num_restarts=8,
        hidden_size=256,
        transformer_layers=6,
        transformer_heads=8,
    )
    net = net_cfg.build_network()
    with open(CKPT, "rb") as f:
        restored = pickle.load(f)
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    @jax.jit
    def guess_fn(pw, vw):
        return net.apply(variables, pw, vw)

    tcfg = TrajectoryConfig(num_frames=16, num_points=8, window=4)
    intr = jnp.asarray([tcfg.focal_length, 0.0, 0.0])

    def ate(est, true_poses):
        true_c = camera_centers_from_poses(true_poses[:, 0:3], true_poses[:, 3:6])
        est_c = camera_centers_from_poses(est[:, 0:3], est[:, 3:6])
        return float(absolute_trajectory_error(est_c, true_c)["rmse"])

    def cost(est, pixels, visibility, cfg=SchurConfig()):
        pts = triangulate_points(est, intr, pixels, visibility)
        return float(
            _weighted_cost(
                BAProblem(intrinsics=intr, poses=est, points=pts),
                BAObservations(pixels=pixels, visibility=visibility),
                cfg,
            )
        )

    recipes = {
        "base_it15_r1": dict(
            solver=SchurConfig(iterations=15, damping=1e-3), rounds=1
        ),
        "it30_r3": dict(
            solver=SchurConfig(iterations=30, damping=1e-3), rounds=3
        ),
    }

    for trial in range(3):
        key = jax.random.key(100 + trial)
        poses, _, pixels, visibility = generate_trajectory(key, tcfg)
        stitched = solve_windowed_vo_learned(guess_fn, pixels, visibility, tcfg)
        row = {
            "trial": trial,
            "stitched_ate": round(ate(stitched, poses), 5),
            "true_cost": round(cost(poses, pixels, visibility), 9),
        }
        for name, kw in recipes.items():
            refined = refine_trajectory_global(
                stitched, intr, pixels, visibility, **kw
            )
            row[name] = {
                "ate": round(ate(refined, poses), 5),
                "cost": round(cost(refined, pixels, visibility), 9),
            }
        # f64 refinement straight from the raw stitched trajectory
        direct64 = refine_trajectory_host_f64(
            stitched, intr, pixels, visibility
        )
        row["f64_from_stitched"] = {"ate": round(ate(direct64, poses), 6)}
        # scale-drift correction -> f32 BA -> f64 polish
        corrected = correct_scale_drift(stitched, intr, pixels, visibility)
        row["driftcorr_ate"] = round(ate(corrected, poses), 5)
        refined = refine_trajectory_global(
            corrected,
            intr,
            pixels,
            visibility,
            solver=SchurConfig(iterations=30, damping=1e-3),
            rounds=2,
        )
        row["driftcorr+ba"] = {"ate": round(ate(refined, poses), 6)}
        polished = refine_trajectory_host_f64(refined, intr, pixels, visibility)
        row["driftcorr+ba+f64"] = {"ate": round(ate(polished, poses), 6)}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
