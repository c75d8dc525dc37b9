"""Fused BFGS inverse-Hessian update + search direction — Pallas TPU kernel.

The ``(B, P, P)`` inverse-Hessian carry dominates the solver's HBM traffic
(reference algebra: ``autograd_solvers/bfgs_solver.py:235-303``).  The
straightforward jnp formulation pays for it three ways:

* XLA materialises several ``B x P x P`` intermediates (the rank-2 update
  terms), multiplying the read/write traffic;
* the ``-H grad`` search-direction matvec re-reads the freshly written H;
* with batch-major layout the minor ``(P, P)`` dims are padded to the
  ``(8, 128)`` f32 tile — 2.8x bandwidth bloat at the headline P = 45.

This kernel stores the carry **channel-major** ``(P, P, B)`` so the batch
dimension fills the 128-wide lanes (P pads only the sublane axis, 45 → 48),
and fuses the eq. 6.20 second-step rescale, the curvature-guarded compact
update, the active-set merge, and the direction matvec into one
read-modify-write pass: H is read once and written once per iteration.

Numerical semantics match the jnp path in :mod:`davo_tpu.solve.bfgs`
(``update_inverse_hessian`` / ``scale_initial_inverse_hessian`` and the
``is_first`` / ``updating`` merges of ``solver_step``) — the solver tests
compare the two paths directly.

On non-TPU backends the kernel runs in interpreter mode (tests); the
solver only selects it on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_bfgs_update_direction", "reference_update_direction"]


def _kernel(flags_ref, h_ref, s_ref, y_ref, g_ref, upd_ref, h_out_ref, d_out_ref):
    """One batch-block: rescale + guarded rank-2 update + direction.

    Shapes per block: ``h (P, P, BB)``, vectors ``(P, BB)``, ``upd (1, BB)``,
    ``flags (1, 2)`` = (is_first, is_second) as f32 in SMEM.

    Structure (the round-3 "rowloop2" tuning winner — 614 GB/s of the
    ~819 GB/s v5e roofline at bf16/block 256, 1.6x the round-2 broadcast
    kernel; ``scripts/tune_bfgs_kernel.py``): every intermediate is a 2-D
    ``(P, BB)`` or ``(1, BB)`` tile — no rank-3 temporaries to spill —
    rows are processed two at a time, and the eq. 6.20 rescale is folded
    into the derived reductions (``y^T (c H) = c (y^T H)``) instead of a
    full-H multiply pass.
    """
    f_first = flags_ref[0, 0]
    f_second = flags_ref[0, 1]
    s = s_ref[...]
    y = y_ref[...]
    g = g_ref[...]
    upd = upd_ref[...]  # (1, BB) in {0.0, 1.0}
    dtype = s.dtype
    p = s.shape[0]

    # inverse curvature 1/(y.s), zeroed where non-positive (utils.guards):
    # with inv_c = 0 every update term vanishes and the update is skipped.
    curvature = jnp.sum(s * y, axis=0, keepdims=True)  # (1, BB)
    positive = curvature > 0.0
    inv_c = jnp.where(positive, 1.0 / jnp.where(positive, curvature, 1.0), 0.0)

    # eq. 6.20 rescale, applied only on the second step (is_second), to
    # updating and frozen elements alike — exactly like the jnp path.
    y_sq = jnp.maximum(jnp.sum(y * y, axis=0, keepdims=True), 1e-5)
    rescale = jnp.maximum(curvature / y_sq, 1e-4)
    scale_eff = 1.0 + f_second * (rescale - 1.0)  # (1, BB)

    # pass 1 on RAW rows (carry may be stored bf16; math in the vector
    # dtype); the rescale is folded into the reductions afterwards.
    # The BFGS inverse-Hessian is symmetric, so H y == (y^T H)^T and both
    # matvecs are LEADING-axis reductions ((P, BB)-tile FMAs on the VPU)
    # instead of cross-sublane shuffles.
    hy_rows = [None] * p
    yth = jnp.zeros_like(y)
    for i in range(0, p, 2):
        row_a = h_ref[i].astype(dtype)
        hy_rows[i] = jnp.sum(row_a * y, axis=0, keepdims=True)
        yth = yth + y[i : i + 1] * row_a
        if i + 1 < p:
            row_b = h_ref[i + 1].astype(dtype)
            hy_rows[i + 1] = jnp.sum(row_b * y, axis=0, keepdims=True)
            yth = yth + y[i + 1 : i + 2] * row_b
    yth = yth * scale_eff
    yhy_on_c = jnp.sum(yth * y, axis=0, keepdims=True) * inv_c
    s_on_c = s * inv_c

    # H+ = c H + (1 + yHy/c) (s/c) s^T - (s/c) (y^T H) - (H y)(s/c)^T,
    # applied only where updating and not the first step; the direction
    # matvec row reduces the freshly built row (symmetry again).
    applied = upd * (1.0 - f_first)  # (1, BB)
    common = (1.0 + yhy_on_c) * s - yth  # (P, BB)
    for i in range(0, p, 2):
        for pp in (i, i + 1):
            if pp >= p:
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


def fused_bfgs_update_direction(
    h_t: jax.Array,
    step: jax.Array,
    delta_gradient: jax.Array,
    gradient: jax.Array,
    updating: jax.Array,
    is_first: jax.Array,
    is_second: jax.Array,
    *,
    block_b: int = 256,
    interpret: bool | None = None,
):
    """Fused second-order state advance for one BFGS iteration.

    :param h_t: ``(P, P, B)`` channel-major inverse-Hessian carry (f32).
    :param step: ``(B, P)`` last parameter step ``s``.
    :param delta_gradient: ``(B, P)`` gradient change ``y``.
    :param gradient: ``(B, P)`` current gradient.
    :param updating: ``(B,)`` boolean active-set mask.
    :param is_first: scalar bool — first solver step (keep H, steepest descent).
    :param is_second: scalar bool — second step (apply the eq. 6.20 rescale).
    :param block_b: batch elements per grid step (lane-dim blocks).
    :param interpret: Pallas interpreter mode.  ``None`` (default) defers
        the choice to **lowering time** via ``jax.lax.platform_dependent``:
        TPU lowers the compiled kernel, every other backend lowers a jnp
        fallback with identical semantics — so a solve traced on a
        TPU-backed process but placed on CPU (e.g. under
        ``jax.default_device``) stays correct instead of failing to
        compile Mosaic for CPU.
    :return: ``(h_out_t (P, P, B), search_direction (B, P))``.
    """
    p = step.shape[-1]
    b = step.shape[0]
    if h_t.shape != (p, p, b):
        raise ValueError(f"expected H of shape {(p, p, b)}, got {h_t.shape}")
    block_b = min(block_b, b)
    while block_b > 1 and b % block_b != 0:
        # fall back to the largest dividing block (batches are %128 by
        # the solver's enable condition; 256 is the tuned fast path)
        block_b //= 2
    if b % block_b != 0:
        raise ValueError(f"batch {b} not divisible by block_b {block_b}")

    if interpret is None:
        def tpu_path(h, s, y, g, u, first, second):
            return fused_bfgs_update_direction(
                h, s, y, g, u, first, second,
                block_b=block_b, interpret=False,
            )

        def jnp_path(h, s, y, g, u, first, second):
            h_bm = jnp.transpose(h, (2, 0, 1)).astype(s.dtype)
            h_out, d = reference_update_direction(
                h_bm, s, y, g, u, first, second
            )
            return jnp.transpose(h_out, (1, 2, 0)).astype(h.dtype), d

        return jax.lax.platform_dependent(
            h_t, step, delta_gradient, gradient, updating, is_first, is_second,
            tpu=tpu_path,
            default=jnp_path,
        )

    # Vector math dtype comes from the iterates (f32); the H carry keeps
    # its own storage dtype (f32 or bfloat16 via BFGSConfig.hessian_dtype).
    dtype = step.dtype
    s_t = step.T
    y_t = delta_gradient.T.astype(dtype)
    g_t = gradient.T.astype(dtype)
    upd = updating.astype(dtype)[None, :]  # (1, B)
    flags = jnp.stack(
        [is_first.astype(dtype), is_second.astype(dtype)]
    ).reshape(1, 2)

    grid = (b // block_b,)
    vec_spec = pl.BlockSpec((p, block_b), lambda i: (0, i), memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec(
        (p, p, block_b), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    h_out, d_t = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((p, p, b), h_t.dtype),
            jax.ShapeDtypeStruct((p, b), dtype),
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
        interpret=interpret,
    )(flags, h_t, s_t, y_t, g_t, upd)
    return h_out, d_t.T


def reference_update_direction(
    h: jax.Array,
    step: jax.Array,
    delta_gradient: jax.Array,
    gradient: jax.Array,
    updating: jax.Array,
    is_first: jax.Array,
    is_second: jax.Array,
):
    """jnp reference of the fused op in batch-major ``(B, P, P)`` layout —
    exactly the Hessian/direction block of ``solver_step`` (tests compare
    the kernel against this)."""
    from davo_tpu.solve.bfgs import (
        scale_initial_inverse_hessian,
        update_inverse_hessian,
    )

    rescale = scale_initial_inverse_hessian(step, delta_gradient)
    h = jnp.where(is_second, rescale[..., None] * h, h)
    updated = update_inverse_hessian(h, step, delta_gradient)
    updated = jnp.where(is_first, h, updated)
    h_out = jnp.where(updating[..., None, None], updated, h)
    direction = -jnp.einsum("...ij,...j->...i", h_out, gradient)
    direction = jnp.where(is_first, -gradient, direction)
    return h_out, direction
