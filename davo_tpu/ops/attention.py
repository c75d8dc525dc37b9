"""Attention over feature descriptors — Pallas TPU kernel + fallback.

The matcher regresses match coordinates as ``softmax(Q K^T / sqrt(D)) V``
(:mod:`davo_tpu.models.matcher`).  For large feature counts the score
matrix ``(K_a x K_b)`` no longer fits on-chip; this module provides a
blocked online-softmax ("flash") kernel that streams key/value blocks
through VMEM and never materialises the scores in HBM.

On non-TPU backends (CPU tests) a reference jnp implementation is used.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

__all__ = ["match_attention", "flash_match_attention"]

_NEG_INF = -1e30


def _reference_attention(query, key, value, mask=None):
    scale = 1.0 / math.sqrt(query.shape[-1])
    logits = jnp.einsum("...qd,...kd->...qk", query, key) * scale
    if mask is not None:
        logits = jnp.where(mask[..., None, :], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...qk,...kc->...qc", weights, value)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, num_kv_blocks: int, d_real: int
):
    """One (batch, q-block) program: stream kv blocks with online softmax."""
    q = q_ref[0]  # (block_q, d)
    scale = 1.0 / math.sqrt(d_real)
    block_q = q.shape[0]
    out_dim = v_ref.shape[-1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        # pl.ds ref-indexing (not lax.dynamic_slice on a loaded array):
        # the latter has no Mosaic lowering on all TPU toolchains.
        from jax.experimental import pallas as pl

        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        scores = (
            jax.lax.dot_general(
                q,
                k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        # mask out padding keys
        col = i * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        scores = jnp.where(col < kv_len, scores, _NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((block_q, out_dim), dtype=jnp.float32)
    m0 = jnp.full((block_q,), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q,), dtype=jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_match_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = None,
) -> jax.Array:
    """Blocked online-softmax attention on TPU via Pallas.

    :param query: ``(B, Q, D)``.
    :param key: ``(B, K, D)``.
    :param value: ``(B, K, C)``.
    :param interpret: run the kernel in the Pallas interpreter (defaults to
        True off-TPU so tests exercise the kernel logic on CPU).
    :return: ``(B, Q, C)`` — ``softmax(QK^T/sqrt(D)) V``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    b, q_len, d = query.shape
    kv_len = key.shape[1]
    out_dim = value.shape[2]

    q_pad = _round_up(q_len, block_q)
    k_pad = _round_up(kv_len, block_k)
    d_pad = _round_up(d, 128)
    c_pad = _round_up(out_dim, 128)

    query_p = jnp.pad(query, ((0, 0), (0, q_pad - q_len), (0, d_pad - d)))
    key_p = jnp.pad(key, ((0, 0), (0, k_pad - kv_len), (0, d_pad - d)))
    value_p = jnp.pad(value, ((0, 0), (0, k_pad - kv_len), (0, c_pad - out_dim)))

    grid = (b, q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            block_k=block_k,
            kv_len=kv_len,
            num_kv_blocks=k_pad // block_k,
            d_real=d,
        ),
        out_shape=jax.ShapeDtypeStruct((b, q_pad, c_pad), query.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d_pad),
                lambda bi, qi: (bi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k_pad, d_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, k_pad, c_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, c_pad),
            lambda bi, qi: (bi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(query_p, key_p, value_p)
    return out[:, :q_len, :out_dim]


def match_attention(query, key, value, mask=None):
    """Descriptor-similarity attention; Pallas on TPU, jnp elsewhere.

    The ``mask`` (``(B, K)`` key validity) is only supported on the
    fallback path for now.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and mask is None and query.ndim == 3:
        return flash_match_attention(query, key, value)
    return _reference_attention(query, key, value, mask)
