"""Micro-profile the headline BFGS solve on the TPU.

Measures, with relay-safe scalar-fetch timing:
  * full solve at the bench workload (B=16384, 20 iters, 8 LS iters)
  * batch scaling (B in {16k, 32k, 64k})
  * component costs via restricted configs:
      - line_search_iterations=1 (minimum probes)
      - gradient-only loop (error+grad evals alone, no H / line search)

Run: timeout 900 python -u scripts/profile_solve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.camera import calibration_error, num_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.solve import BFGSConfig, bfgs_solve

NUM_VIEWS = 4
NUM_POINTS = 8
ITERATIONS = 20


def make_problem(batch_size):
    cfg = SceneConfig(num_views=NUM_VIEWS, num_points=NUM_POINTS)
    batch = generate_batch(jax.random.key(0), batch_size, cfg)
    p = num_calibration_parameters(NUM_VIEWS, NUM_POINTS)
    guess = 0.1 * jax.random.normal(jax.random.key(1), (batch_size, p))
    guess = guess.at[:, 0].add(1.0)
    guess = guess.at[:, 3 + 2 : 3 + 3 * NUM_POINTS : 3].add(1.0)
    vis = batch.visibility_mask.astype(guess.dtype)

    def err_fn(params):
        return calibration_error(params, batch.projected_points, vis)

    return err_fn, guess


def timed(fn, *args):
    float(fn(*args))  # compile + warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        runs.append(time.perf_counter() - t0)
    return min(runs)


def report(name, seconds, batch_size):
    print(
        json.dumps(
            {
                "case": name,
                "ms": round(1e3 * seconds, 2),
                "iters_per_s": round(batch_size * ITERATIONS / seconds),
            }
        ),
        flush=True,
    )


def main():
    for b in (16384, 32768, 65536):
        err_fn, guess = make_problem(b)
        cfg = BFGSConfig(
            error_threshold=-1.0,
            iterations=ITERATIONS,
            minimum_step=0.0,
            drop_path_p=0.0,
            line_search_iterations=8,
        )

        @jax.jit
        def solve(g):
            return jnp.sum(bfgs_solve(err_fn, g, cfg))

        report(f"full_solve_b{b}", timed(solve, guess), b)

    b = 16384
    err_fn, guess = make_problem(b)

    # line search cut to 1 iteration: isolates probe cost
    cfg1 = BFGSConfig(
        error_threshold=-1.0,
        iterations=ITERATIONS,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=1,
    )

    @jax.jit
    def solve_ls1(g):
        return jnp.sum(bfgs_solve(err_fn, g, cfg1))

    report("ls1_solve_b16384", timed(solve_ls1, guess), b)

    # raw gradient-descent-shaped loop: 20 value_and_grad evals + axpy,
    # no Hessian, no line search — the floor for any quasi-Newton loop.
    @jax.jit
    def grad_loop(g):
        def body(params, _):
            e, grad = jax.value_and_grad(lambda p: err_fn(p).sum())(params)
            return params - 1e-3 * grad, e

        out, _ = jax.lax.scan(body, g, None, length=ITERATIONS)
        return jnp.sum(out)

    report("grad_only_loop_b16384", timed(grad_loop, guess), b)

    # Hessian-update-shaped traffic: 20 iterations of the rank-2 update
    # algebra on a (B, P, P) carry, nothing else.
    p = guess.shape[-1]
    h0 = jnp.broadcast_to(jnp.eye(p), (b, p, p))
    s = jnp.ones((b, p)) * 1e-2
    y = jnp.ones((b, p)) * 1e-2

    @jax.jit
    def h_loop(h):
        def body(hc, _):
            rho = 1.0 / jnp.einsum("bp,bp->b", y, s)
            hy = jnp.einsum("bpq,bq->bp", hc, y)
            yhy = jnp.einsum("bp,bp->b", y, hy)
            term = (rho**2 * yhy + rho)[:, None, None] * jnp.einsum(
                "bp,bq->bpq", s, s
            )
            cross = rho[:, None, None] * (
                jnp.einsum("bp,bq->bpq", hy, s)
                + jnp.einsum("bp,bq->bpq", s, hy)
            )
            return hc + term - cross, None

        out, _ = jax.lax.scan(body, h, None, length=ITERATIONS)
        return jnp.sum(out)

    report("h_update_loop_b16384", timed(h_loop, h0), b)


if __name__ == "__main__":
    main()
