"""Error-budget the learned-VO gap (VERDICT r4 item 2).

Official round-4 recipe sits at mean ATE 0.328 over the four official
seeds vs 0.087 for oracle-matches incremental.  This decomposes the gap
with stage swaps on the OFFICIAL configuration (frontend v4, ba_irls 2):

* ``official``          — learned detections + learned bootstrap (baseline)
* ``oracle_detections`` — oracle projections as the per-frame detection
  sets (scores = visibility); learned everything else.  Removes detector
  noise/misses but keeps learned bootstrap + greedy association.
* ``oracle_bootstrap``  — learned detections, but the bootstrap window's
  observations (and the global track table init) come from the oracle.
  Removes matcher/bootstrap error but keeps detector + association.
* ``oracle_both``       — both swaps: remaining error is the
  association + PnP/BA pipeline itself.
* ``ba_budget``         — official stages with the BA budget raised
  (solver iterations 10 -> 30, ba_irls 2 -> 4): is the tail starved?

Run: PLATFORM=axon JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 7200 python -u scripts/vo_error_budget_r5.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("FRONTEND_DIR", "artifacts/ckpt_frontend_v4")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hardseed_study import build_fns, per_frame_error  # noqa: E402  (sets platform)
from davo_tpu.train.vo_eval import (  # noqa: E402
    TrajectoryConfig,
    SchurConfig,
    generate_trajectory,
    render_trajectory_images,
    solve_learned_vo_incremental,
)

TRIALS = [int(t) for t in os.environ.get("TRIALS", "0,1,2,3").split(",")]
STAGES = os.environ.get(
    "STAGES", "official,oracle_detections,oracle_bootstrap,oracle_both,ba_budget"
).split(",")


def run_stage(stage, fns, tcfg, trial):
    guess_fn, frontend_fn, detections_fn, _descriptors_fn, render_config = fns
    key = jax.random.key(100 + trial)
    poses, _, o_pixels, o_vis = generate_trajectory(key, tcfg)
    images = render_trajectory_images(
        o_pixels, o_vis, jax.random.fold_in(key, 11), render_config
    )
    tracks, track_vis = frontend_fn(images[None])
    tracks, track_vis = tracks[0], track_vis[0]
    dets, dscores = detections_fn(images[None])
    detections, det_scores = dets[0], dscores[0]

    def window_obs_fn(s):
        return frontend_fn(images[s : s + tcfg.window][None])

    solver = tcfg.solver
    ba_irls = 2
    if stage == "ba_budget":
        solver = dataclasses.replace(solver, iterations=30)
        ba_irls = 4
    if stage in ("oracle_detections", "oracle_both"):
        detections = o_pixels
        det_scores = o_vis.astype(detections.dtype)
    if stage in ("oracle_bootstrap", "oracle_both"):
        tracks = o_pixels
        track_vis = o_vis.astype(o_pixels.dtype)
        window_obs_fn = None

    est = solve_learned_vo_incremental(
        guess_fn,
        tracks,
        track_vis.astype(tracks.dtype),
        dataclasses.replace(tcfg, solver=solver),
        irls_rounds=2,
        detections=detections,
        det_scores=det_scores,
        window_obs_fn=window_obs_fn,
        ba_irls=ba_irls,
    )
    pfe = per_frame_error(key, tcfg, jnp.asarray(est))
    return {
        "rmse": float(np.sqrt(np.mean(pfe**2))),
        "mean": float(pfe.mean()),
        "max": float(pfe.max()),
    }


def main():
    fns = build_fns()
    tcfg = TrajectoryConfig(num_frames=16, num_points=8, window=4, stride=0)
    summary = {}
    for stage in STAGES:
        rmses = []
        for trial in TRIALS:
            r = run_stage(stage, fns, tcfg, trial)
            rmses.append(r["rmse"])
            print(
                json.dumps(
                    {
                        "stage": stage,
                        "trial": trial,
                        **{k: round(v, 4) for k, v in r.items()},
                    }
                ),
                flush=True,
            )
        summary[stage] = round(float(np.mean(rmses)), 4)
        print(json.dumps({"stage": stage, "mean_rmse": summary[stage]}), flush=True)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
