"""Profiling / debugging utilities.

The reference's observability is Lightning's ``ModelSummary`` +
``detect_anomaly`` (commented out in its configs).  TPU-native analogues:

* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile of the compiled program.
* :func:`timed` — wall-clock timing with ``block_until_ready`` (the only
  honest way to time async dispatch).
* :func:`debug_nans` — scoped NaN detection (``jax_debug_nans``), the
  analogue of torch's ``detect_anomaly``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Tuple

import jax

__all__ = ["trace", "timed", "debug_nans"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of everything run in the block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, repeats: int = 5, **kwargs) -> Tuple[float, object]:
    """Best-of-``repeats`` wall time of ``fn(*args)`` with a warm-up call
    and ``block_until_ready`` around each run.

    :return: ``(seconds, last_result)``.
    """
    result = jax.block_until_ready(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(repeats):
        start = time.perf_counter()
        result = jax.block_until_ready(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - start)
    return best, result


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped NaN checking: any NaN produced inside the block raises
    (re-running the offending primitive eagerly for a precise traceback)."""
    previous = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", previous)
