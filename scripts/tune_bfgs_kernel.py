"""Tune the fused BFGS update kernel: block size + kernel structure.

Isolated H-update loop (20 iterations), slope-timed between chain
lengths.  Roofline: (P,P,B) f32 carry read+write = 2 * 48*45*16384*4 B
per iteration ~ 283 MB -> ~0.35 ms/iter at 819 GB/s.

Run: timeout 1800 python -u scripts/tune_bfgs_kernel.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from davo_tpu.ops.bfgs_update import _kernel as broadcast_kernel

B, P, IT = 16384, 45, 20


def rowloop_kernel(flags_ref, h_ref, s_ref, y_ref, g_ref, upd_ref, h_out_ref, d_out_ref):
    """Row-at-a-time variant: every intermediate is 2-D (P, BB) or (1, BB);
    no rank-3 temporaries, so larger batch blocks fit in VMEM."""
    f_first = flags_ref[0, 0]
    f_second = flags_ref[0, 1]
    s = s_ref[...]
    y = y_ref[...]
    g = g_ref[...]
    upd = upd_ref[...]

    curvature = jnp.sum(s * y, axis=0, keepdims=True)
    positive = curvature > 0.0
    inv_c = jnp.where(positive, 1.0 / jnp.where(positive, curvature, 1.0), 0.0)
    y_sq = jnp.maximum(jnp.sum(y * y, axis=0, keepdims=True), 1e-5)
    rescale = jnp.maximum(curvature / y_sq, 1e-4)
    scale_eff = 1.0 + f_second * (rescale - 1.0)  # (1, BB)

    # pass 1: hy_p = sum_q H_pq y_q and yth_q = sum_p y_p H_pq, row by row
    hy_rows = []
    yth = jnp.zeros_like(y)
    for p in range(P):
        row = h_ref[p] * scale_eff  # (P, BB)
        hy_rows.append(jnp.sum(row * y, axis=0, keepdims=True))  # (1, BB)
        yth = yth + y[p : p + 1] * row
    yhy_on_c = jnp.zeros_like(curvature)
    for p in range(P):
        yhy_on_c = yhy_on_c + yth[p : p + 1] * y[p : p + 1]
    yhy_on_c = yhy_on_c * inv_c
    s_on_c = s * inv_c
    applied = upd * (1.0 - f_first)
    common = (1.0 + yhy_on_c) * s - yth  # (P, BB)

    # pass 2: H'_p = H_p + applied * (s_on_c_p * common - hy_p * s_on_c)
    for p in range(P):
        row = h_ref[p] * scale_eff + applied * (
            s_on_c[p : p + 1] * common - hy_rows[p] * s_on_c
        )
        h_out_ref[p] = row
        d_row = -jnp.sum(row * g, axis=0, keepdims=True)
        d_out_ref[p] = (f_first * (-g[p : p + 1]) + (1.0 - f_first) * d_row)[0]


def rowloop2_kernel(flags_ref, h_ref, s_ref, y_ref, g_ref, upd_ref, h_out_ref, d_out_ref):
    """Rowloop with a 2-row unroll and the eq. 6.20 rescale folded into
    the derived quantities instead of a full-H multiply pass:
    with Hs = scale * H,  y^T Hs = scale * (y^T H), so pass 1 runs on the
    RAW rows and scales the reductions once — one fewer multiply per H
    entry in pass 1."""
    f_first = flags_ref[0, 0]
    f_second = flags_ref[0, 1]
    s = s_ref[...]
    y = y_ref[...]
    g = g_ref[...]
    upd = upd_ref[...]
    dtype = s.dtype

    curvature = jnp.sum(s * y, axis=0, keepdims=True)
    positive = curvature > 0.0
    inv_c = jnp.where(positive, 1.0 / jnp.where(positive, curvature, 1.0), 0.0)
    y_sq = jnp.maximum(jnp.sum(y * y, axis=0, keepdims=True), 1e-5)
    rescale = jnp.maximum(curvature / y_sq, 1e-4)
    scale_eff = 1.0 + f_second * (rescale - 1.0)  # (1, BB)

    # pass 1 on RAW rows; scale folded into the reductions afterwards
    hy_rows = [None] * P
    yth = jnp.zeros_like(y)
    for p in range(0, P, 2):
        row_a = h_ref[p].astype(dtype)
        row_b = h_ref[p + 1].astype(dtype) if p + 1 < P else None
        hy_rows[p] = jnp.sum(row_a * y, axis=0, keepdims=True)
        yth = yth + y[p : p + 1] * row_a
        if row_b is not None:
            hy_rows[p + 1] = jnp.sum(row_b * y, axis=0, keepdims=True)
            yth = yth + y[p + 1 : p + 2] * row_b
    yth = yth * scale_eff
    yhy_on_c = jnp.sum(yth * y, axis=0, keepdims=True) * inv_c
    s_on_c = s * inv_c
    applied = upd * (1.0 - f_first)
    common = (1.0 + yhy_on_c) * s - yth  # (P, BB)

    for p in range(0, P, 2):
        for pp in (p, p + 1):
            if pp >= P:
                break
            row = h_ref[pp].astype(dtype) * scale_eff + applied * (
                s_on_c[pp : pp + 1] * common
                - (hy_rows[pp] * scale_eff) * s_on_c
            )
            h_out_ref[pp] = row.astype(h_out_ref.dtype)
            d_row = -jnp.sum(row * g, axis=0, keepdims=True)
            d_out_ref[pp] = (
                f_first * (-g[pp : pp + 1]) + (1.0 - f_first) * d_row
            )[0]


def build(kernel, block_b, h_dtype=jnp.float32):
    grid = (B // block_b,)
    vec_spec = pl.BlockSpec((P, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((P, P, block_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    def op(h_t, s_t, y_t, g_t, upd, flags):
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((P, P, B), h_dtype),
                jax.ShapeDtypeStruct((P, B), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
                h_spec,
                vec_spec,
                vec_spec,
                vec_spec,
                pl.BlockSpec((1, block_b), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(h_spec, vec_spec),
        )(flags, h_t, s_t, y_t, g_t, upd)

    return op


def slope_ms(op, h_dtype=jnp.float32):
    h0 = jnp.broadcast_to(jnp.eye(P)[:, :, None], (P, P, B)).astype(h_dtype)
    v = jnp.full((P, B), 1e-2, jnp.float32)
    upd = jnp.ones((1, B), jnp.float32)
    flags = jnp.zeros((1, 2), jnp.float32)

    times = {}
    for reps in (1, 5):

        @jax.jit
        def run(h, v=v, reps=reps):
            def body(carry, _):
                hc, vc = carry
                h2, d = op(hc, vc, vc, vc, upd, flags)
                return (h2, vc + 1e-9 * d), None

            def rep(carry, _):
                out, _ = jax.lax.scan(body, carry, None, length=IT)
                return out, None

            (h2, v2), _ = jax.lax.scan(rep, (h, v), None, length=reps)
            return jnp.sum(v2)

        float(run(h0))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(h0))
            best = min(best, time.perf_counter() - t0)
        times[reps] = best
    return 1e3 * (times[5] - times[1]) / 4


def main():
    cases = [
        ("broadcast", broadcast_kernel, 128, jnp.float32),
        ("rowloop", rowloop_kernel, 128, jnp.float32),
        ("rowloop2", rowloop2_kernel, 128, jnp.float32),
        ("rowloop2", rowloop2_kernel, 256, jnp.float32),
        ("broadcast", broadcast_kernel, 128, jnp.bfloat16),
        ("broadcast", broadcast_kernel, 256, jnp.bfloat16),
        ("rowloop2", rowloop2_kernel, 128, jnp.bfloat16),
        ("rowloop2", rowloop2_kernel, 256, jnp.bfloat16),
        ("rowloop2", rowloop2_kernel, 512, jnp.bfloat16),
    ]
    for name, kernel, bb, hdt in cases:
        bpe = jnp.dtype(hdt).itemsize
        try:
            ms = slope_ms(build(kernel, bb, hdt), hdt)
            print(
                json.dumps(
                    {
                        "kernel": name,
                        "block_b": bb,
                        "h_dtype": jnp.dtype(hdt).name,
                        "ms_per_20_iters": round(ms, 2),
                        "GBps": round(2 * 48 * P * B * bpe * IT / ms / 1e6, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - report and continue tuning
            print(json.dumps({"kernel": name, "block_b": bb,
                              "h_dtype": jnp.dtype(hdt).name,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
