"""Round-5 bench tuning: warm-started backtracking + probe-budget sweep.

VERDICT r4 item 4: refresh the speed-of-light story at the 24M operating
point and attack the dominant term.  The round-5 ADVICE fix made
``warm_start_line_search`` real for backtracking (first candidate = 2x
the previous accepted step); fewer lockstep probe rounds should cut the
line-search share directly.  Each variant reports throughput AND final
mean error at the fixed 20-iteration budget so speed never silently buys
worse convergence.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 3600 python -u scripts/tune_bench_r5.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from davo_tpu.ops.calibration_obj import make_fused_calibration_objective
from davo_tpu.solve import BFGSConfig, bfgs_solve

BATCH = bench.BATCH
ITERATIONS = bench.ITERATIONS


def measure(name, solver, err_fn, vg_fn, guess):
    def chained(reps):
        @jax.jit
        def run(g):
            def body(p, _):
                return (
                    bfgs_solve(err_fn, p, solver, value_and_grad_fn=vg_fn),
                    None,
                )

            out, _ = jax.lax.scan(body, g, None, length=reps)
            return jnp.sum(out)

        float(run(guess))
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(guess))
            runs.append(time.perf_counter() - t0)
        return min(runs)

    t_long, t_one = chained(4), chained(1)
    per_solve = (t_long - t_one) / 3
    if per_solve <= 0:
        per_solve = t_long / 4
    solved = jax.jit(
        lambda g: bfgs_solve(err_fn, g, solver, value_and_grad_fn=vg_fn)
    )(guess)
    final = float(jnp.mean(err_fn(solved)))
    print(
        json.dumps(
            {
                "variant": name,
                "iters_per_s_M": round(BATCH * ITERATIONS / per_solve / 1e6, 2),
                "ms_per_solve": round(per_solve * 1e3, 2),
                "final_mean_error": round(final, 5),
            }
        ),
        flush=True,
    )


def main():
    device = jax.devices()[0]
    batch, guess = bench.make_problem(device)
    err_fn, vg_fn = make_fused_calibration_objective(
        batch.projected_points, batch.visibility_mask.astype(guess.dtype)
    )
    base = BFGSConfig(
        error_threshold=-1.0,
        iterations=ITERATIONS,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=8,
        line_search_method="backtracking",
        fused_hessian_kernel=device.platform == "tpu",
        hessian_dtype="bfloat16" if device.platform == "tpu" else None,
    )
    variants = [
        ("baseline_bt8", base),
        ("warm_bt8", dataclasses.replace(base, warm_start_line_search=True)),
        (
            "warm_bt6",
            dataclasses.replace(
                base, warm_start_line_search=True, line_search_iterations=6
            ),
        ),
        (
            "warm_bt4",
            dataclasses.replace(
                base, warm_start_line_search=True, line_search_iterations=4
            ),
        ),
        (
            "warm_bt3",
            dataclasses.replace(
                base, warm_start_line_search=True, line_search_iterations=3
            ),
        ),
        (
            "warmcap1_bt6",
            dataclasses.replace(
                base,
                warm_start_line_search=True,
                warm_start_max_alpha=1.0,
                line_search_iterations=6,
            ),
        ),
        (
            "warmcap1_bt4",
            dataclasses.replace(
                base,
                warm_start_line_search=True,
                warm_start_max_alpha=1.0,
                line_search_iterations=4,
            ),
        ),
        ("bt6", dataclasses.replace(base, line_search_iterations=6)),
        ("bt4", dataclasses.replace(base, line_search_iterations=4)),
    ]
    for name, solver in variants:
        measure(name, solver, err_fn, vg_fn, guess)


if __name__ == "__main__":
    main()
