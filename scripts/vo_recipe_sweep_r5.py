"""Config sweep attacking the learned-VO tail (VERDICT r4 item 2, step 2).

The round-5 error budget (artifacts/vo_error_budget_r5_cpu.log) showed
the association+PnP/BA core is near-oracle (0.038 mean rmse) when both
detections and bootstrap are oracle, while a raised BA budget
(iterations 30 + ba_irls 4) recovers ~0.06 mean rmse on the OFFICIAL
learned path for pure compute.  This sweeps the cheap configuration
levers on the official stages (frontend v4, geometric association):

* ``official``  — round-4 recipe (iterations 10, ba_irls 2, 3 bootstraps)
* ``ba30i4``    — BA budget raise measured in the error budget
* ``ba30i4_b5`` — + 5 bootstrap windows (selection has more candidates)
* ``ba30i4_cp2``— + one TRUE reversed re-association pass (the round-4
  "neutral" chain-pass measurement ran the same-order bug the round-5
  ADVICE fix replaced; reversal attacks exactly the early-drift bake-in
  the hard-seed study diagnosed)
* ``ba30i4_b5_cp2`` — both

Run (CPU, ~15 min): timeout 10000 python -u scripts/vo_recipe_sweep_r5.py
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

from hardseed_study import build_fns, per_frame_error  # noqa: E402
from davo_tpu.train.vo_eval import (  # noqa: E402
    TrajectoryConfig,
    generate_trajectory,
    render_trajectory_images,
    solve_learned_vo_incremental,
)

TRIALS = [int(t) for t in os.environ.get("TRIALS", "0,1,2,3").split(",")]

VARIANTS = {
    "official": dict(),
    "ba30i4": dict(iterations=30, ba_irls=4),
    "ba30i4_b5": dict(iterations=30, ba_irls=4, num_bootstraps=5),
    "ba30i4_cp2": dict(iterations=30, ba_irls=4, chain_passes=2),
    "ba30i4_b5_cp2": dict(
        iterations=30, ba_irls=4, num_bootstraps=5, chain_passes=2
    ),
}
ONLY = os.environ.get("VARIANTS")
if ONLY:
    VARIANTS = {k: VARIANTS[k] for k in ONLY.split(",")}


def run_variant(spec, fns, tcfg, trial):
    guess_fn, frontend_fn, detections_fn, _desc_fn, render_config = fns
    key = jax.random.key(100 + trial)
    poses, _, o_pixels, o_vis = generate_trajectory(key, tcfg)
    images = render_trajectory_images(
        o_pixels, o_vis, jax.random.fold_in(key, 11), render_config
    )
    tracks, track_vis = frontend_fn(images[None])
    tracks, track_vis = tracks[0], track_vis[0]
    dets, dscores = detections_fn(images[None])

    def window_obs_fn(s):
        return frontend_fn(images[s : s + tcfg.window][None])

    solver = tcfg.solver
    if "iterations" in spec:
        solver = dataclasses.replace(solver, iterations=spec["iterations"])
    est = solve_learned_vo_incremental(
        guess_fn,
        tracks,
        track_vis.astype(tracks.dtype),
        dataclasses.replace(tcfg, solver=solver),
        irls_rounds=2,
        detections=dets[0],
        det_scores=dscores[0],
        window_obs_fn=window_obs_fn,
        ba_irls=spec.get("ba_irls", 2),
        num_bootstraps=spec.get("num_bootstraps", 3),
        chain_passes=spec.get("chain_passes", 1),
    )
    pfe = per_frame_error(key, tcfg, jnp.asarray(est))
    return {
        "rmse": float(np.sqrt(np.mean(pfe**2))),
        "max": float(pfe.max()),
    }


def main():
    fns = build_fns()
    tcfg = TrajectoryConfig(num_frames=16, num_points=8, window=4, stride=0)
    summary = {}
    for name, spec in VARIANTS.items():
        rmses = []
        for trial in TRIALS:
            r = run_variant(spec, fns, tcfg, trial)
            rmses.append(r["rmse"])
            print(
                json.dumps(
                    {
                        "variant": name,
                        "trial": trial,
                        **{k: round(v, 4) for k, v in r.items()},
                    }
                ),
                flush=True,
            )
        summary[name] = round(float(np.mean(rmses)), 4)
        print(json.dumps({"variant": name, "mean_rmse": summary[name]}), flush=True)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
