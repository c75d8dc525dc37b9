"""Predicted multi-chip scaling of the distributed Schur BA solvers.

VERDICT r4 item 6: combines the HLO-audited analytic communication model
(``davo_tpu/parallel/comm_model.py``) with *measured* single-chip
per-iteration compute time to predict N-chip efficiency against the
≥80 % BASELINE target — the hardware-free stand-in for a real pod run.

Measures on whatever backend it runs on (slope-timed through the relay,
same protocol as bench.py); run on the TPU for the quotable numbers:

  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  timeout 1800 python -u scripts/comm_model_report.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from davo_tpu.parallel.comm_model import (
    predict_efficiency,
    schur_1d_traffic,
    schur_2d_traffic,
    wire_bytes_per_device,
)
from davo_tpu.parallel.schur import (
    BAObservations,
    BAProblem,
    SchurConfig,
    schur_ba_solve,
)

# production-scale long-sequence BA window (32 keyframes, 4096 map points);
# override for CPU smoke runs: COMM_M=8 COMM_N=256
M = int(os.environ.get("COMM_M", "32"))
N = int(os.environ.get("COMM_N", "4096"))
ITERS = 10

# TPU v5e interconnect assumptions (public "How to Scale Your Model"
# numbers): 45 GB/s per ICI link direction, ring all-reduce uses both
# directions -> 90 GB/s effective; DCN ~ 25 GB/s per host.
ICI = 9.0e10
DCN = 2.5e10


def slope_time(fn, x0, reps_long=4):
    """Per-call seconds via chain-length slope (relay-safe)."""

    def chained(reps):
        @jax.jit
        def run(x):
            def body(carry, _):
                return fn(carry), None

            out, _ = jax.lax.scan(body, x, None, length=reps)
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), out, 0.0
            )

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
    platform = jax.devices()[0].platform
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    prob = BAProblem(
        jnp.asarray([1.2, 0.0, 0.0], jnp.float32),
        0.05 * jax.random.normal(k1, (M, 6), jnp.float32),
        jax.random.normal(k2, (N, 3), jnp.float32)
        + jnp.asarray([0, 0, 8.0], jnp.float32),
    )
    obs = BAObservations(
        0.5 * jax.random.normal(k3, (M, N, 2), jnp.float32),
        jnp.ones((M, N), jnp.float32),
    )
    cfg = SchurConfig(iterations=ITERS)

    # single-chip compute: full LM solve -> per-iteration seconds
    def solve_step(p):
        out = schur_ba_solve(p, obs, cfg)
        # feed back, damped: keeps per-rep work identical, defeats CSE
        return jax.tree_util.tree_map(
            lambda a, b: a + 1e-6 * b, prob, out
        )

    t_solve = slope_time(solve_step, prob)
    t_iter = t_solve / ITERS

    # serial fraction: the replicated reduced-system solve (C x C dense,
    # double solve for iterative refinement) every device repeats
    c = 3 + 6 * M
    s_mat = jnp.eye(c, dtype=jnp.float32) * 4.0 + 0.01 * jax.random.normal(
        jax.random.key(1), (c, c)
    )
    rhs0 = jnp.ones((c,), jnp.float32)

    def cam_solve(r):
        dc = jnp.linalg.solve(s_mat, r)
        dc = dc + jnp.linalg.solve(s_mat, r - s_mat @ dc)
        return r + 1e-6 * dc

    t_serial = slope_time(cam_solve, rhs0, reps_long=16)
    serial_fraction = min(t_serial / t_iter, 0.5)

    report = {
        "platform": platform,
        "M": M,
        "N": N,
        "camera_dim": c,
        "ms_per_lm_iteration_1chip": round(t_iter * 1e3, 4),
        "ms_replicated_camera_solve": round(t_serial * 1e3, 4),
        "serial_fraction": round(serial_fraction, 4),
        "scaling": [],
    }
    print(json.dumps({k: v for k, v in report.items() if k != "scaling"}))

    for label, bw in (("ici", ICI), ("dcn", DCN)):
        for d in (2, 4, 8, 16, 32):
            row = {"mesh": f"1d_pt{d}", "link": label}
            traffic = schur_1d_traffic(M, N, d)
            row.update(
                {
                    k: (round(v, 6) if isinstance(v, float) else v)
                    for k, v in predict_efficiency(
                        t_iter,
                        traffic,
                        serial_fraction=serial_fraction,
                        devices=d,
                        link_bytes_per_second=bw,
                    ).items()
                }
            )
            report["scaling"].append(row)
            print(json.dumps(row))
        for a, b in ((2, 2), (2, 4), (4, 4), (4, 8)):
            if N % b or (N // b) % a or M % a:
                continue
            row = {"mesh": f"2d_kf{a}_pt{b}", "link": label}
            traffic = schur_2d_traffic(M, N, a, b)
            row.update(
                {
                    k: (round(v, 6) if isinstance(v, float) else v)
                    for k, v in predict_efficiency(
                        t_iter,
                        traffic,
                        serial_fraction=serial_fraction,
                        devices=a * b,
                        link_bytes_per_second=bw,
                    ).items()
                }
            )
            report["scaling"].append(row)
            print(json.dumps(row))

    out = "artifacts/comm_model_report.json"
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"saved": out}))


if __name__ == "__main__":
    main()
