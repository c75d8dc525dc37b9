"""Matmul-precision control.

TPU matmuls/einsums default to bfloat16 passes (f32 inputs are rounded to
bf16 for the MXU).  That is the right default for the heavy learned paths,
but it silently corrupts small precision-critical computations: a single
``R^T t`` mat-vec at |t| ~ 12 carries ~0.05 absolute error under bf16
mantissas — which was measured in this project as a phantom ~0.06 ATE
floor in the *evaluation metrics themselves*, and as a real accuracy floor
in the Schur BA's normal equations.  Anything that forms normal equations,
alignments, or metric outputs should trace under
``jax.default_matmul_precision("highest")``; at the sizes involved the
cost is negligible.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["full_f32_matmuls"]


def full_f32_matmuls(fn):
    """Decorator: trace ``fn`` under
    ``jax.default_matmul_precision("highest")`` so every dot/einsum it
    creates uses full-f32 passes on TPU (no-op on CPU)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
