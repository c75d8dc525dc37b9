"""Scaling benchmark: frames/s efficiency of the data-parallel training
step across mesh sizes (BASELINE.md reporting points: 1 chip / 1 host /
N hosts).

Weak scaling: the per-device problem count is fixed, so ideal scaling is
throughput(N) = N * throughput(1) and efficiency = throughput(N) /
(N * throughput(1)).

Prints one JSON line per mesh size plus a summary line.  On a single-chip
or virtual-CPU environment the numbers exercise the mechanism; real
efficiency figures require a pod slice.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# The image's sitecustomize pins JAX_PLATFORMS=axon, so the env var alone
# cannot select the virtual-CPU mesh; flip the config before any device
# query (after that, clients are cached and cannot be switched):
#   SCALING_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#       python bench_scaling.py
if os.environ.get("SCALING_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import CalibrationExperiment, create_train_state
from davo_tpu.parallel import make_mesh, make_dp_train_step, replicate

PER_DEVICE_BATCH = 64


def _config(batch_size: int) -> CalibrationExperiment:
    return CalibrationExperiment(
        num_views=4,
        num_points=8,
        hidden_size=256,
        batch_size=batch_size,
        solver=BFGSConfig(
            error_threshold=1e-7,
            training_error_threshold=1e-3,
            iterations=5,
            training_iterations=5,
            drop_path_p=0.1,
            line_search_iterations=8,
        ),
    )


def measure(n_devices: int) -> float:
    config = _config(PER_DEVICE_BATCH * n_devices)
    mesh = make_mesh(n_devices)
    network, state = create_train_state(config, jax.random.key(0))
    state = replicate(state, mesh)
    step = make_dp_train_step(network, config, mesh)
    key = replicate(jax.random.key(1), mesh)
    state, _ = step(state, key)  # compile
    jax.block_until_ready(state.params)
    runs = []
    for i in range(3):
        start = time.perf_counter()
        state, _ = step(state, jax.random.fold_in(key, i))
        jax.block_until_ready(state.params)
        runs.append(time.perf_counter() - start)
    return config.batch_size / min(runs)


def measure_ba_2d(kf: int, pt: int, m: int = 16, n_points: int = 64) -> float:
    """Keyframe x point 2-D mesh Schur BA steps/s (weak per-mesh problem)."""
    import numpy as np

    from davo_tpu.parallel import (
        BAObservations,
        BAProblem,
        SchurConfig,
        distributed_schur_ba_2d,
        schur_ba_solve,
    )

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    points = jnp.asarray(
        np.concatenate(
            [rng.normal(size=(n_points, 2)) * 2.0, 8.0 + rng.normal(size=(n_points, 1))],
            axis=-1,
        ),
        jnp.float32,
    )
    poses = np.zeros((m, 6), np.float32)
    poses[:, 0:3] = rng.normal(size=(m, 3)) * 0.05
    poses[:, 3:5] = rng.normal(size=(m, 2)) * 0.5
    poses[0] = 0.0
    problem = BAProblem(
        intrinsics=jnp.asarray([1.4, 0.05, -0.05], jnp.float32),
        poses=jnp.asarray(poses),
        points=points,
    )
    from davo_tpu.geometry import rotate_vector_axis_angle

    rel = (
        rotate_vector_axis_angle(points[None], problem.poses[:, None, 0:3])
        + problem.poses[:, None, 3:6]
    )
    pixels = jnp.stack(
        [
            1.4 * rel[..., 0] / rel[..., 2] + 0.05,
            1.4 * rel[..., 1] / rel[..., 2] - 0.05,
        ],
        axis=-1,
    )
    obs = BAObservations(pixels=pixels, visibility=jnp.ones((m, n_points), bool))
    cfg = SchurConfig(iterations=10)
    if kf * pt == 1:
        solve = jax.jit(lambda p: schur_ba_solve(p, obs, cfg))
    else:
        import numpy as _np
        from jax.sharding import Mesh

        mesh = Mesh(
            _np.asarray(jax.devices()[: kf * pt]).reshape(kf, pt), ("kf", "pt")
        )
        solve = jax.jit(lambda p: distributed_schur_ba_2d(p, obs, mesh, cfg))
    out = solve(problem)
    jax.block_until_ready(out.points)
    runs = []
    for _ in range(3):
        start = time.perf_counter()
        out = solve(problem)
        jax.block_until_ready(out.points)
        runs.append(time.perf_counter() - start)
    return cfg.iterations / min(runs)


def main():
    available = len(jax.devices())
    if os.environ.get("SCALING_MODE") == "ba2d":
        # keyframe x point mesh sweep for the distributed BA
        shapes = [(1, 1)]
        if available >= 4:
            shapes.append((2, 2))
        if available >= 8:
            shapes += [(4, 2), (2, 4)]
        base = None
        for kf, pt in shapes:
            sps = measure_ba_2d(kf, pt)
            base = base or sps
            print(
                json.dumps(
                    {
                        "mesh": f"{kf}x{pt}",
                        "ba_steps_per_s": round(sps, 2),
                        "speedup": round(sps / base, 3),
                    }
                ),
                flush=True,
            )
        return
    sizes = sorted({1, 2, available} & set(range(1, available + 1)))
    results = {}
    for n in sizes:
        fps = measure(n)
        results[n] = fps
        print(
            json.dumps(
                {"mesh_devices": n, "frames_per_s": round(fps, 1)}
            ),
            flush=True,
        )
    base = results[sizes[0]]
    summary = {
        "metric": "frames_per_s_scaling_efficiency",
        "value": round(results[sizes[-1]] / (sizes[-1] * base), 3),
        "unit": f"efficiency at {sizes[-1]} devices (weak scaling, "
        f"{PER_DEVICE_BATCH} problems/device)",
        "vs_baseline": round(results[sizes[-1]] / base, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
