"""Micro-profile the headline BFGS solve on the TPU — slope-timed.

Every jit invocation through the axon relay pays a fixed ~23 ms
dispatch+fetch round-trip, so each case is measured as the slope between
two dependent-chain lengths inside one jit (see CLAUDE.md).

Cases:
  * full solve (bench workload: B=16384, 20 iters, 8 LS iters, fused H)
  * line_search_iterations=1 (isolates extra line-search probes)
  * jnp (unfused) Hessian path for comparison
  * value-and-grad-only loop (20 evals)
  * forward-only loop (20 evals)
  * fused Hessian kernel loop (20 updates, nothing else)

Run: timeout 1200 python -u scripts/profile_solve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.camera import calibration_error_fast, num_calibration_parameters
from davo_tpu.data import SceneConfig, generate_batch
from davo_tpu.ops import fused_bfgs_update_direction
from davo_tpu.solve import BFGSConfig, bfgs_solve

B, M, N, IT = 16384, 4, 8, 20


def make_problem():
    batch = generate_batch(
        jax.random.key(0), B, SceneConfig(num_views=M, num_points=N)
    )
    p = num_calibration_parameters(M, N)
    guess = 0.1 * jax.random.normal(jax.random.key(1), (B, p))
    guess = guess.at[:, 0].add(1.0)
    guess = guess.at[:, 3 + 2 : 3 + 3 * N : 3].add(1.0)
    vis = batch.visibility_mask.astype(guess.dtype)

    def err_fn(params):
        return calibration_error_fast(params, batch.projected_points, vis)

    return err_fn, guess


def slope_ms(make_chain, reps_pair=(1, 5)):
    """Compile chains of both lengths, return per-rep ms from the slope."""
    times = {}
    for reps in reps_pair:
        fn = jax.jit(make_chain(reps))
        float(fn())  # compile + warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    r0, r1 = reps_pair
    return 1e3 * (times[r1] - times[r0]) / (r1 - r0)


def main():
    err_fn, guess = make_problem()

    # the bench operating point additionally runs the fused Pallas
    # objective (value+grad in one kernel) and bf16 H-carry
    from davo_tpu.data import SceneConfig, generate_batch  # noqa: F811
    from davo_tpu.ops.calibration_obj import make_fused_calibration_objective

    batch = generate_batch(
        jax.random.key(0), B, SceneConfig(num_views=M, num_points=N)
    )
    fused_err_fn, fused_vg_fn = make_fused_calibration_objective(
        batch.projected_points, batch.visibility_mask.astype(guess.dtype)
    )

    def solve_chain(cfg, e_fn=err_fn, vg_fn=None):
        def make(reps):
            def run():
                def body(p, _):
                    return (
                        bfgs_solve(e_fn, p, cfg, value_and_grad_fn=vg_fn),
                        None,
                    )

                out, _ = jax.lax.scan(body, guess, None, length=reps)
                return jnp.sum(out)

            return run

        return make

    base = dict(
        error_threshold=-1.0,
        iterations=IT,
        minimum_step=0.0,
        drop_path_p=0.0,
        line_search_iterations=8,
    )
    bench_pt = dict(
        fused_hessian_kernel=True,
        hessian_dtype="bfloat16",
        line_search_method="backtracking",
    )
    cases = {
        "bench_bt8_fusedobj": (
            BFGSConfig(**bench_pt, **base),
            fused_err_fn,
            fused_vg_fn,
        ),
        "bench_bt1_fusedobj": (
            BFGSConfig(**bench_pt, **{**base, "line_search_iterations": 1}),
            fused_err_fn,
            fused_vg_fn,
        ),
        "bench_bt8_jnpobj": (BFGSConfig(**bench_pt, **base), err_fn, None),
        "wolfe8_fusedobj": (
            BFGSConfig(
                fused_hessian_kernel=True, hessian_dtype="bfloat16", **base
            ),
            fused_err_fn,
            fused_vg_fn,
        ),
        "full_solve_fused": (BFGSConfig(fused_hessian_kernel=True, **base), err_fn, None),
        "full_solve_jnp_h": (BFGSConfig(fused_hessian_kernel=False, **base), err_fn, None),
        "ls1_solve_fused": (
            BFGSConfig(
                fused_hessian_kernel=True,
                **{**base, "line_search_iterations": 1},
            ),
            err_fn,
            None,
        ),
    }
    for name, (cfg, e_fn, vg_fn) in cases.items():
        ms = slope_ms(solve_chain(cfg, e_fn, vg_fn))
        print(
            json.dumps(
                {"case": name, "ms": round(ms, 2), "iters_per_s": round(B * IT / ms * 1e3)}
            ),
            flush=True,
        )

    def fused_vg_loop(reps):
        def run():
            def body(p, _):
                e, g = fused_vg_fn(p)
                return p - 1e-6 * g - 1e-9 * e[:, None], None

            def rep(p, _):
                out, _ = jax.lax.scan(body, p, None, length=IT)
                return out, None

            out, _ = jax.lax.scan(rep, guess, None, length=reps)
            return jnp.sum(out)

        return run

    print(
        json.dumps(
            {"case": "fused_vg_loop_20", "ms": round(slope_ms(fused_vg_loop), 2)}
        ),
        flush=True,
    )

    def fused_val_loop(reps):
        def run():
            def body(p, _):
                return p - 1e-9 * fused_err_fn(p)[:, None], None

            def rep(p, _):
                out, _ = jax.lax.scan(body, p, None, length=IT)
                return out, None

            out, _ = jax.lax.scan(rep, guess, None, length=reps)
            return jnp.sum(out)

        return run

    print(
        json.dumps(
            {"case": "fused_val_loop_20", "ms": round(slope_ms(fused_val_loop), 2)}
        ),
        flush=True,
    )

    def vg_chain(reps):
        def run():
            def body(p, _):
                e, g = jax.value_and_grad(lambda q: err_fn(q).sum())(p)
                return p - 1e-3 * g, None

            def rep(p, _):
                out, _ = jax.lax.scan(body, p, None, length=IT)
                return out, None

            out, _ = jax.lax.scan(rep, guess, None, length=reps)
            return jnp.sum(out)

        return run

    print(json.dumps({"case": "vg_loop_20", "ms": round(slope_ms(vg_chain), 2)}))

    def fwd_chain(reps):
        def run():
            def body(p, _):
                return p - 1e-6 * err_fn(p)[:, None], None

            def rep(p, _):
                out, _ = jax.lax.scan(body, p, None, length=IT)
                return out, None

            out, _ = jax.lax.scan(rep, guess, None, length=reps)
            return jnp.sum(out)

        return run

    print(json.dumps({"case": "fwd_loop_20", "ms": round(slope_ms(fwd_chain), 2)}))

    p = guess.shape[-1]
    h0 = jnp.broadcast_to(jnp.eye(p)[:, :, None], (p, p, B))
    s = jnp.full((B, p), 1e-2)

    def h_chain(reps):
        def run():
            def body(carry, _):
                h, v = carry
                h2, d = fused_bfgs_update_direction(
                    h,
                    v,
                    v,
                    v,
                    jnp.ones((B,), bool),
                    jnp.asarray(False),
                    jnp.asarray(False),
                )
                return (h2, v + 1e-9 * d), None

            def rep(carry, _):
                out, _ = jax.lax.scan(body, carry, None, length=IT)
                return out, None

            (h2, v), _ = jax.lax.scan(rep, (h0, s), None, length=reps)
            return jnp.sum(v)

        return run

    print(
        json.dumps(
            {"case": "fused_h_loop_20", "ms": round(slope_ms(h_chain), 2)}
        )
    )


if __name__ == "__main__":
    main()
