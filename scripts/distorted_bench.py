"""Distorted-model (Brown-Conrady) LM pipeline bench at production batch.

VERDICT r3 item 8: the reference's only @torch.jit.script surface is the
16-param distorted camera's closed-form 2Nx16 Jacobian
(/root/reference/deep_attention_visual_odometry/camera_model/
distorted_camera_model.py:114-385).  davo_tpu gets equal VALUES via
forward-mode autodiff (camera/distortion.py, finite-difference-checked);
this measures whether that lowering is also a production-rate path on TPU:

  - batched LM iterations/s at batch >= 4096 (slope-timed through the
    relay, same protocol as bench.py),
  - the jacfwd cost share (residual+jacobian vs residual-only eval),
  - recovery accuracy at that batch (max/mean parameter error).

Run (TPU): JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
           timeout 3000 python -u scripts/distorted_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.camera.distorted_calibration import (
    DistortedSceneConfig,
    generate_distorted_scenes,
    refine_distorted,
)
from davo_tpu.camera.distortion import (
    NUM_DISTORTED_PARAMS,
    distorted_project,
    distorted_project_and_jacobian,
)
from davo_tpu.solve.least_squares import LMConfig

ITERATIONS = 60
PERTURBATION = 0.02


def time_fn(step, x0, reps_long=4):
    """Slope timing between chain lengths (relay protocol).

    ``step(x) -> x_like`` must depend on its input (the chain feeds each
    output back as the next input, defeating CSE between reps)."""

    def chained(reps):
        @jax.jit
        def run(x):
            def body(carry, _):
                return step(carry), None

            out, _ = jax.lax.scan(body, x, None, length=reps)
            return jnp.sum(out)

        float(run(x0))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x0))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_long, t_one = chained(reps_long), chained(1)
    per = (t_long - t_one) / (reps_long - 1)
    return per if per > 0 else t_long / reps_long


def main():
    device = jax.devices()[0]
    scene = DistortedSceneConfig()
    lm = LMConfig(iterations=ITERATIONS)
    for batch in (4096, 8192):
        run_one(device, scene, lm, batch)
    # host-CPU ratio at the production batch (the reference's
    # torch.jit.script Jacobian targets CPU)
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return
    if cpu.platform != device.platform:
        with jax.default_device(cpu):
            run_one(cpu, scene, lm, 4096, reps_long=2)


def run_one(device, scene, lm, batch, reps_long=4):
    if True:
        key = jax.random.key(0)
        k_scene, k_pert = jax.random.split(key)
        world, pixels, true_params = generate_distorted_scenes(
            k_scene, batch, scene
        )
        scale = jnp.ones(
            (NUM_DISTORTED_PARAMS,), true_params.dtype
        ).at[13:16].set(5.0)
        start = true_params + PERTURBATION * scale * jax.random.normal(
            k_pert, true_params.shape, true_params.dtype
        )

        def solve(s):
            # feeding the result back (damped to stay near the start)
            # keeps the per-rep work identical while defeating CSE
            return start + 1e-6 * refine_distorted(world, pixels, s, lm)

        per_solve = time_fn(solve, start, reps_long=reps_long)
        iters_per_s = batch * ITERATIONS / per_solve

        refined = jax.jit(lambda s: refine_distorted(world, pixels, s, lm))(
            start
        )
        err = jnp.abs(refined - true_params)
        res = distorted_project(world, refined) - pixels

        # jacfwd share: residual+jacobian vs residual-only eval cost
        def rj(s):
            proj, jac = distorted_project_and_jacobian(world, s)
            return s + 1e-12 * (jnp.sum(proj) + jnp.sum(jac))

        def r_only(s):
            return s + 1e-12 * jnp.sum(distorted_project(world, s))

        # micro timings need long chains: a 0.2-5 ms op against the
        # relay's ~23 ms dispatch floor is pure noise at 8 reps
        t_rj = time_fn(rj, start, reps_long=128)
        t_r = time_fn(r_only, start, reps_long=128)

        print(
            json.dumps(
                {
                    "batch": batch,
                    "num_points": scene.num_points,
                    "lm_iterations": ITERATIONS,
                    "ms_per_solve": round(per_solve * 1e3, 2),
                    "lm_iters_per_s": round(iters_per_s / 1e6, 3),
                    "max_param_error": round(float(jnp.max(err)), 6),
                    "mean_param_error": round(float(jnp.mean(err)), 7),
                    "rms_residual": round(
                        float(jnp.sqrt(jnp.mean(jnp.square(res)))), 8
                    ),
                    "value_jac_ms": round(t_rj * 1e3, 3),
                    "value_only_ms": round(t_r * 1e3, 3),
                    "jac_overhead_x": round(t_rj / max(t_r, 1e-9), 2),
                    "platform": device.platform,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
