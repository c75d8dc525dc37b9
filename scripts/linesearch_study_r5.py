"""Backtracking vs strong-Wolfe on the real pipelines (VERDICT r4 item 3).

Round 4 made Armijo backtracking the bench solver (faster AND better
final error on that workload) but left strong Wolfe the default
everywhere else, untested on the paths users actually run.  This script
settles it on TPU:

1. the official calibration eval (v4 checkpoint, 32 restarts,
   basin-anchor selection — the recipe behind f_error 0.159 / ATE 0.216),
   plus the 8-restart error-selection variant, timing the compiled eval
   step;
2. the windows-VO oracle pipeline (v3 checkpoint, raw stitched ATE with
   no refinement — the solve-quality-sensitive number; the refined path
   converges to ~5e-6 regardless);
3. the incremental pipeline is LM-based (PnP + Schur BA, no BFGS line
   search anywhere) — out of scope by construction.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 7200 python -u scripts/linesearch_study_r5.py
"""

import dataclasses
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.train import (
    create_train_state,
    evaluate_calibration_ate,
    get_preset,
    make_eval_step,
    restore_checkpoint,
)

V4_CKPT = "artifacts/ckpt_v4_calib"
VO_CKPT = "artifacts/vo_windows_transformer_v3_1200.pkl"


def _with_method(cfg, method):
    return dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, line_search_method=method)
    )


def calibration_eval(method, restarts, selection, batches=16):
    cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        hidden_size=448,
        transformer_layers=10,
        transformer_heads=8,
        num_restarts=restarts,
        selection=selection,
    )
    cfg = _with_method(cfg, method)
    key = jax.random.key(cfg.seed)
    network, state = create_train_state(cfg, key)
    restored = restore_checkpoint(V4_CKPT)
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    eval_step = make_eval_step(network, cfg)
    metrics, times = [], []
    for i in range(batches):
        t0 = time.perf_counter()
        m = eval_step(state, jax.random.fold_in(key, 1000 + i))
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
        metrics.append(m)
    avg = {
        k: float(jnp.mean(jnp.stack([m[k] for m in metrics])))
        for k in metrics[0]
    }
    avg.update(
        evaluate_calibration_ate(
            network, state, cfg, jax.random.fold_in(key, 7), batches=4
        )
    )
    # first batch pays the compile; min over the rest is the run rate
    avg["ms_per_eval_batch_min"] = round(min(times[1:]) * 1e3, 2)
    print(
        json.dumps(
            {
                "study": "calibration",
                "method": method,
                "restarts": restarts,
                "selection": selection,
                **{k: round(v, 6) for k, v in avg.items()},
            }
        ),
        flush=True,
    )


def windows_vo(method, trials=3):
    from davo_tpu.train.vo_eval import TrajectoryConfig, evaluate_learned_vo

    net_cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        num_views=4,
        num_points=8,
        hidden_size=384,
        transformer_layers=8,
        transformer_heads=8,
        num_restarts=8,
    )
    net_cfg = _with_method(net_cfg, method)
    net = net_cfg.build_network()
    with open(VO_CKPT, "rb") as f:
        restored = pickle.load(f)
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    @jax.jit
    def guess_fn(pw, vw):
        return net.apply(variables, pw, vw)

    rmses = []
    for trial in range(trials):
        t0 = time.perf_counter()
        out = evaluate_learned_vo(
            guess_fn,
            jax.random.key(100 + trial),
            TrajectoryConfig(num_frames=16, num_points=8, window=4),
            refine=False,
        )
        rmse = float(out["rmse"])
        rmses.append(rmse)
        print(
            json.dumps(
                {
                    "study": "windows_vo_raw",
                    "method": method,
                    "trial": trial,
                    "ate_rmse": round(rmse, 5),
                    "seconds": round(time.perf_counter() - t0, 1),
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "study": "windows_vo_raw",
                "method": method,
                "mean_ate_rmse": round(sum(rmses) / len(rmses), 5),
            }
        ),
        flush=True,
    )


def main():
    for method in ("wolfe", "backtracking"):
        calibration_eval(method, restarts=32, selection="basin")
        calibration_eval(method, restarts=8, selection="error")
    for method in ("wolfe", "backtracking"):
        windows_vo(method)


if __name__ == "__main__":
    main()
