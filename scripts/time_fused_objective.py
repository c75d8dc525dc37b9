"""Slope-timing of the fused calibration objective kernels (slim runner).

check_fused_objective.py covers parity + block sweep; the block_b=1024
Mosaic compile hangs through the relay, so this runner does ONLY the
chained-scan slope timings at the default block (256).

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python -u scripts/time_fused_objective.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.camera import calibration_error_fast, num_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.ops.calibration_obj import (
    calibration_value_and_dirderiv,
    calibration_value_and_grad,
)

BATCH, M, N = 16384, 4, 8
P = num_calibration_parameters(M, N)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = SceneConfig(num_views=M, num_points=N)
    batch = generate_batch(jax.random.key(0), BATCH, cfg)
    guess = 0.1 * jax.random.normal(jax.random.key(1), (BATCH, P))
    guess = guess.at[:, 0].add(1.0)
    guess = guess.at[:, 3 + 2 : 3 + 3 * N : 3].add(1.0)
    pts = batch.projected_points.astype(jnp.float32)
    vis = batch.visibility_mask.astype(jnp.float32)
    u_t = jnp.transpose(pts[..., 0], (1, 2, 0))
    v_t = jnp.transpose(pts[..., 1], (1, 2, 0))
    vis_t = jnp.transpose(vis, (1, 2, 0))
    direction = jax.random.normal(jax.random.key(2), (BATCH, P))

    def jnp_vg(params):
        err, pullback = jax.vjp(
            lambda q: calibration_error_fast(q, pts, vis), params
        )
        (grad,) = pullback(jnp.ones_like(err))
        return err, grad

    def timed(fn, label):
        def chained(reps):
            @jax.jit
            def run(p):
                def body(q, _):
                    e, g = fn(q)
                    return q + 1e-6 * g, e

                out, es = jax.lax.scan(body, p, None, length=reps)
                return jnp.sum(out) + jnp.sum(es)

            float(run(guess))
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(guess))
                runs.append(time.perf_counter() - t0)
            return min(runs)

        t_long, t_one = chained(33), chained(1)
        per = (t_long - t_one) / 32
        print(f"{label}: {per * 1e3:.3f} ms/eval", flush=True)
        return per

    timed(jnp_vg, "jnp value+grad")
    timed(
        lambda p: calibration_value_and_grad(p, u_t, v_t, vis_t),
        "fused value+grad",
    )

    def jnp_dd(p):
        return jax.jvp(
            lambda q: calibration_error_fast(q, pts, vis), (p,), (direction,)
        )

    def dd_as_vg(fn):
        def wrapped(p):
            e, dphi = fn(p)
            return e, dphi[:, None] * direction

        return wrapped

    timed(dd_as_vg(jnp_dd), "jnp value+dirderiv")
    timed(
        dd_as_vg(
            lambda p: calibration_value_and_dirderiv(
                p, direction, u_t, v_t, vis_t
            )
        ),
        "fused value+dirderiv",
    )


if __name__ == "__main__":
    main()
