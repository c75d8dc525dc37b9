"""Noise sensitivity of the windowed learned VO (diagnostic).

The first learned-matches vo-eval returned ATE ~9.8 vs oracle ~0.24 —
this study separates the two candidate causes by feeding the SAME
pipeline oracle matches with increasing synthetic pixel noise:

* if tiny noise (~0.01, the front-end's inlier precision) already
  destroys the stitched ATE, the guess head is the brittle part (it was
  trained on exact projections only) -> fix is noise-augmented guess
  training;
* if oracle+noise stays fine at the front-end's precision, the failure
  is the outlier tail / duplicate selections -> fix is NMS + confidence
  gating in the front-end.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python -u scripts/vo_noise_study.py
"""

import dataclasses
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from davo_tpu.train import get_preset
from davo_tpu.train.vo_eval import TrajectoryConfig, evaluate_learned_vo

CKPT = "artifacts/vo_windows_transformer_v3_1200.pkl"
SIGMAS = (0.0, 0.005, 0.01, 0.02, 0.05)
TRIALS = 2


def main():
    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=4,
        num_points=8,
        num_restarts=8,
        hidden_size=384,
        transformer_layers=8,
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

    for sigma in SIGMAS:
        tcfg = TrajectoryConfig(
            num_frames=16, num_points=8, window=4, pixel_noise=sigma
        )
        rmses = []
        for trial in range(TRIALS):
            ate = evaluate_learned_vo(
                guess_fn, jax.random.key(100 + trial), tcfg, refine=False
            )
            rmses.append(float(ate["rmse"]))
        print(
            json.dumps(
                {
                    "pixel_noise": sigma,
                    "raw_ate_rmse_mean": sum(rmses) / len(rmses),
                    "trials": rmses,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
