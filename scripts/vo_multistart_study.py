"""Measure refine_trajectory_multistart vs single-start global refinement
on learned-VO stitched trajectories (CPU, eval-regime f32).

Run: timeout 3000 python -u scripts/vo_multistart_study.py
"""

import dataclasses
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from davo_tpu.train import get_preset
from davo_tpu.train.evaluation import (
    absolute_trajectory_error,
    camera_centers_from_poses,
)
from davo_tpu.train.vo_eval import (
    TrajectoryConfig,
    generate_trajectory,
    refine_trajectory_global,
    refine_trajectory_host_f64,
    refine_trajectory_multistart,
    solve_windowed_vo_learned,
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

    for trial in range(4):
        key = jax.random.key(100 + trial)
        poses, _, pixels, visibility = generate_trajectory(key, tcfg)
        stitched = solve_windowed_vo_learned(guess_fn, pixels, visibility, tcfg)
        row = {"trial": trial, "stitched_ate": round(ate(stitched, poses), 5)}
        single = refine_trajectory_global(stitched, intr, pixels, visibility, rounds=2)
        row["single_ate"] = round(ate(single, poses), 6)
        for nh, sigma in ((8, 0.25), (16, 0.25), (16, 0.5)):
            multi = refine_trajectory_multistart(
                stitched,
                intr,
                pixels,
                visibility,
                jax.random.fold_in(key, 7),
                num_hypotheses=nh,
                sigma=sigma,
            )
            row[f"multi{nh}_s{sigma}_ate"] = round(ate(multi, poses), 6)
        polished = refine_trajectory_host_f64(multi, intr, pixels, visibility)
        row["multi+f64_ate"] = round(ate(polished, poses), 6)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
