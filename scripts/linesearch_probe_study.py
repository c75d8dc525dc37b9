"""Line-search probe-count study (VERDICT r3 item 3).

ROADMAP's SOL decomposition: at 13.5-14.3M iters/s the headline solve
spends ~48% of its time in ~160 line-search probes (8-probe cap x 20
iterations).  This measures, on the exact bench workload, the
(per-solve time, mean final error) frontier over:

  - line_search_iterations cap in {8, 6, 5, 4, 3}
  - warm_start_line_search in {False, True}

Accept any config with error within noise of the 8-probe baseline
(mean 0.572) and the best time.

Run (TPU): JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
           timeout 3000 python -u scripts/linesearch_probe_study.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from davo_tpu.solve import BFGSConfig, bfgs_solve
from davo_tpu.ops.calibration_obj import make_fused_calibration_objective


def main():
    device = jax.devices()[0]
    on_tpu = device.platform == "tpu"
    batch, guess = bench.make_problem(device)
    vis = batch.visibility_mask.astype(guess.dtype)
    err_fn, value_and_grad_fn = make_fused_calibration_objective(
        batch.projected_points, vis
    )
    if not on_tpu:
        value_and_grad_fn = None
        from davo_tpu.camera import calibration_error

        def err_fn(params):  # noqa: F811
            return calibration_error(params, batch.projected_points, vis)

    def run_config(ls_iters, warm, method="wolfe"):
        solver = BFGSConfig(
            error_threshold=-1.0,
            iterations=bench.ITERATIONS,
            minimum_step=0.0,
            drop_path_p=0.0,
            line_search_iterations=ls_iters,
            warm_start_line_search=warm,
            line_search_method=method,
            fused_hessian_kernel=on_tpu,
            hessian_dtype="bfloat16" if on_tpu else None,
        )

        def chained(reps):
            @jax.jit
            def run(g):
                def body(p, _):
                    return (
                        bfgs_solve(
                            err_fn, p, solver,
                            value_and_grad_fn=value_and_grad_fn,
                        ),
                        None,
                    )
                out, _ = jax.lax.scan(body, g, None, length=reps)
                return jnp.sum(out)

            with jax.default_device(device):
                float(run(guess))
                runs = []
                for _ in range(3):
                    start = time.perf_counter()
                    float(run(guess))
                    runs.append(time.perf_counter() - start)
            return min(runs)

        long_reps = 4 if on_tpu else 2
        t_long, t_one = chained(long_reps), chained(1)
        per_solve = (t_long - t_one) / (long_reps - 1)
        if per_solve <= 0:
            per_solve = t_long / long_reps

        # final error of one solve
        @jax.jit
        def solve_once(g):
            out = bfgs_solve(
                err_fn, g, solver, value_and_grad_fn=value_and_grad_fn
            )
            return jnp.mean(err_fn(out))

        with jax.default_device(device):
            mean_err = float(solve_once(guess))
        iters_per_s = bench.BATCH * bench.ITERATIONS / per_solve
        print(
            json.dumps(
                {
                    "ls_iters": ls_iters,
                    "warm_start": warm,
                    "method": method,
                    "ms_per_solve": round(per_solve * 1e3, 2),
                    "iters_per_s": round(iters_per_s / 1e6, 3),
                    "mean_final_error": round(mean_err, 5),
                }
            ),
            flush=True,
        )

    modes = os.environ.get("MODES", "wolfe_sweep").split(",")
    if "wolfe_sweep" in modes:
        for warm in (False, True):
            for ls in (8, 6, 5, 4, 3):
                run_config(ls, warm)
    if "backtracking" in modes:
        for ls in (8, 5, 4, 3, 2):
            run_config(ls, False, method="backtracking")


if __name__ == "__main__":
    main()
