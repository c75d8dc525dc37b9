"""Attention over feature descriptors — Pallas TPU kernel + fallback.

The matcher regresses match coordinates as ``softmax(Q K^T / sqrt(D)) V``
(:mod:`davo_tpu.models.matcher`, reference
``networks/modules/feature_match_module.py:34-39``).  For large feature
counts the score matrix ``(K_a x K_b)`` no longer fits on-chip; this module
provides a blocked online-softmax ("flash") kernel in which *both* the
query and the key/value streams are tiled: the grid is
``(batch, q_blocks, kv_blocks)`` with the kv axis innermost, and the
per-q-block softmax statistics (running max, normaliser, output
accumulator) live in VMEM scratch that persists across the sequential kv
grid steps.  VMEM footprint is therefore O(block_q * block_k), independent
of sequence length — no spill at 16k+ keys (the previous kernel held the
full K/V in VMEM per program).

Key-validity masks are supported natively: a fully-masked query row
returns zeros (the jnp fallback would return the mean of ``value`` because
softmax of an all ``-inf`` row is uniform — do not rely on either output
for rows with no valid keys).

On non-TPU backends (CPU tests) a reference jnp implementation is used;
the kernel itself is exercised in interpreter mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["match_attention", "flash_match_attention"]

_NEG_INF = -1e30
# m/l scratch keeps one value per query row, replicated across a full
# 128-lane vector register (scalar-per-sublane layouts are not tileable).
_STATS_LANES = 128


def _reference_attention(query, key, value, mask=None):
    scale = 1.0 / math.sqrt(query.shape[-1])
    logits = jnp.einsum("...qd,...kd->...qk", query, key) * scale
    if mask is not None:
        logits = jnp.where(mask[..., None, :], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kc->...qc", weights, value)


def _flash_kernel(
    q_ref,
    kt_ref,
    vt_ref,
    mask_ref,
    o_ref,
    acc_ref,
    m_ref,
    l_ref,
    *,
    d_real: int,
):
    """One (batch, q-block, kv-block) grid step of online-softmax attention.

    The kv axis is the innermost grid dimension, so for a fixed
    (batch, q-block) the steps run back-to-back and the scratch refs carry
    the running statistics from one kv block to the next.

    K and V arrive channel-major (``(D, block_k)`` / ``(C, block_k)``): the
    channel dimension is typically 64, and keeping it out of the lane
    dimension avoids padding it to 128 — which would double the dominant
    HBM traffic (K/V re-streamed per q block).
    """
    ki = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (block_q, d)
    kt = kt_ref[0]  # (d, block_k)
    vt = vt_ref[0]  # (c, block_k)
    mask = mask_ref[0, 0]  # (block_k,) float 0/1; padding keys are 0

    scale = 1.0 / math.sqrt(d_real)
    scores = (
        jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )
    scores = jnp.where(mask[None, :] > 0, scores, _NEG_INF)

    m_prev = m_ref[...]  # (block_q, 128), lanes identical
    l_prev = l_ref[...]
    m_curr = jnp.max(scores, axis=-1, keepdims=True)  # (block_q, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast -> (block_q, 128)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(scores - m_next[:, 0:1])
    # A block whose keys are all masked has scores == m == _NEG_INF and
    # exp(0) == 1 would leak in; the explicit multiply keeps masked keys at
    # exactly zero weight in every case.
    p = p * mask[None, :]
    l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_next
    # acc += p @ v == p (block_q, block_k) contracted with vt's lane axis.
    acc_ref[...] = acc_ref[...] * alpha[:, 0:1] + jax.lax.dot_general(
        p.astype(vt.dtype), vt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_kv - 1)
    def _():
        normaliser = jnp.maximum(l_ref[:, 0:1], 1e-30)
        o_ref[0] = (acc_ref[...] / normaliser).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_match_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    mask: jax.Array | None = None,
    *,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = None,
) -> jax.Array:
    """Blocked online-softmax attention on TPU via Pallas.

    Both Q and K/V are streamed block-by-block; VMEM use is
    O(block_q * block_k + block sizes), independent of Q/K length.

    :param query: ``(B, Q, D)``.
    :param key: ``(B, K, D)``.
    :param value: ``(B, K, C)``.
    :param mask: optional ``(B, K)`` boolean key validity; invalid keys get
        zero attention weight.  Rows with no valid keys return zeros.
    :param interpret: run the kernel in the Pallas interpreter (defaults to
        True off-TPU so tests exercise the kernel logic on CPU).
    :return: ``(B, Q, C)`` — ``softmax(QK^T/sqrt(D)) V``.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    b, q_len, d = query.shape
    kv_len = key.shape[1]
    out_dim = value.shape[2]

    q_pad = _round_up(q_len, block_q)
    k_pad = _round_up(kv_len, block_k)
    # Channel dims live in the sublane axis (multiple-of-8), not the
    # 128-wide lane axis: descriptor dims are typically 64 and padding them
    # to 128 lanes would double the dominant K/V HBM traffic.
    c_pad = _round_up(out_dim, 8)
    block_q = min(block_q, q_pad)
    block_k = min(block_k, k_pad)

    query_p = jnp.pad(query, ((0, 0), (0, q_pad - q_len), (0, 0)))
    key_t = jnp.swapaxes(key, 1, 2)  # (B, D, K)
    key_t = jnp.pad(key_t, ((0, 0), (0, 0), (0, k_pad - kv_len)))
    value_t = jnp.swapaxes(value, 1, 2)  # (B, C, K)
    value_t = jnp.pad(
        value_t, ((0, 0), (0, c_pad - out_dim), (0, k_pad - kv_len))
    )
    # Fold the padding-key exclusion into the mask so the kernel has a
    # single masking mechanism.  (B, 1, K): the unit sublane dimension
    # keeps the trailing two dims tileable.
    if mask is None:
        maskf = jnp.ones((b, kv_len), dtype=jnp.float32)
    else:
        maskf = mask.astype(jnp.float32)
    maskf = jnp.pad(maskf, ((0, 0), (0, k_pad - kv_len)))[:, None, :]

    grid = (b, q_pad // block_q, k_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, d_real=d),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, c_pad), query.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d),
                lambda bi, qi, ki: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d, block_k),
                lambda bi, qi, ki: (bi, 0, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c_pad, block_k),
                lambda bi, qi, ki: (bi, 0, ki),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bi, qi, ki: (bi, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, c_pad),
            lambda bi, qi, ki: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, c_pad), jnp.float32),
            pltpu.VMEM((block_q, _STATS_LANES), jnp.float32),
            pltpu.VMEM((block_q, _STATS_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(query_p, key_t, value_t, maskf)
    return out[:, :q_len, :out_dim]


def match_attention(query, key, value, mask=None):
    """Descriptor-similarity attention; Pallas on TPU, jnp elsewhere.

    Note the fully-masked-row caveat in :func:`flash_match_attention`.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and query.ndim == 3:
        return flash_match_attention(query, key, value, mask)
    return _reference_attention(query, key, value, mask)
