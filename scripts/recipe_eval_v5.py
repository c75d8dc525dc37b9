"""Settle the calibration-guess plateau (VERDICT r4/r5 item 1).

Round 4's tokens-vs-noise comparison ran on a 600-epoch underfit head
(val focal-loss 0.14 vs v4's 0.056), so "tokens beat noise by 21%
focal error" carried an underfit confound.  This evaluates the
FULL-BUDGET (1800-epoch) v5 multi-token head against the official v4
recipe on identical eval batches:

* v4  + noise  @8 error    — round-2+ baseline recipe
* v4  + noise  @32 basin   — the official number (f_error 0.159 / ATE 0.216)
* v5t + tokens @8 error    — token proposals on the full-budget head
* v5t + noise  @8 error    — same head, noise proposals (ablation)
* v5t + tokens @32 basin   — tokens + official selection budget

Done-bar: f_error <= 0.10, or a recorded negative that closes the
recipe thread with the underfit confound removed.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 7200 python -u scripts/recipe_eval_v5.py
"""

import dataclasses
import json
import os
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

V4 = dict(ckpt="artifacts/ckpt_v4_calib", hidden=448, layers=10, tokens=1)
V5 = dict(ckpt="artifacts/ckpt_v5_tokens", hidden=384, layers=8, tokens=8)


def run_case(name, arch, proposals, restarts, selection, batches=16):
    cfg = dataclasses.replace(
        get_preset("calibration_transformer_curriculum"),
        hidden_size=arch["hidden"],
        transformer_layers=arch["layers"],
        transformer_heads=8,
        guess_tokens=arch["tokens"],
        restart_proposals=proposals,
        num_restarts=restarts,
        selection=selection,
    )
    key = jax.random.key(cfg.seed)
    network, state = create_train_state(cfg, key)
    restored = restore_checkpoint(arch["ckpt"])
    state = state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
    eval_step = make_eval_step(network, cfg)
    t0 = time.perf_counter()
    metrics = []
    for i in range(batches):
        m = eval_step(state, jax.random.fold_in(key, 1000 + i))
        jax.block_until_ready(m)
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
    print(
        json.dumps(
            {
                "case": name,
                "proposals": proposals,
                "restarts": restarts,
                "selection": selection,
                "seconds": round(time.perf_counter() - t0, 1),
                **{k: round(v, 6) for k, v in avg.items()},
            }
        ),
        flush=True,
    )


def main():
    run_case("v4_noise8_error", V4, "noise", 8, "error")
    run_case("v4_noise32_basin", V4, "noise", 32, "basin")
    run_case("v5t_tokens8_error", V5, "tokens", 8, "error")
    run_case("v5t_noise8_error", V5, "noise", 8, "error")
    run_case("v5t_tokens32_basin", V5, "tokens", 32, "basin")


if __name__ == "__main__":
    main()
