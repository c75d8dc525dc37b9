"""Metric logging: stdout + optional JSONL file + TensorBoard + summaries.

The reference logs through TensorBoard + MLflow with per-step ``self.log``
and a weight-histogram helper
(``training_modules/camera_optimisation_training_module.py:49-63``,
``camera_calibration_from_oracle_matches.py:56-69``); the TPU build
streams the same metric names to a JSONL file that any tracker can ingest
(no logging dependency in the hot path), and optionally mirrors them to a
TensorBoard event directory for observability parity.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["MetricsLogger", "weight_summaries"]


class MetricsLogger:
    """Callable matching the ``fit(log_fn=...)`` signature
    ``(split, epoch, metrics)``; prints one line, appends JSONL, and
    (with ``tensorboard_dir``) writes ``<split>/<name>`` scalars per
    epoch to a TensorBoard event file."""

    def __init__(
        self,
        path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        run: Optional[dict] = None,
    ):
        self.path = path
        self.run = run
        self._run_id = (run or {}).get("run_id")
        self._start = time.time()
        self._writer = None
        if run is not None and path:
            # provenance header: a JSONL record carrying the run manifest
            # (run_id, config hash, git SHA — train/runs.py).  Appending
            # to an existing file buries this mid-stream, so every metric
            # record is also stamped with run_id below — consumers must
            # attribute records by run_id, not by header position.
            with open(path, "a") as f:
                f.write(json.dumps({"run": run}) + "\n")
        if tensorboard_dir:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=tensorboard_dir)

    def __call__(self, split: str, epoch: int, metrics: Dict[str, float]):
        record = {
            "split": split,
            "epoch": epoch,
            "elapsed_s": round(time.time() - self._start, 3),
            **{k: float(v) for k, v in metrics.items()},
        }
        if self._run_id is not None:
            record["run_id"] = self._run_id
        line = json.dumps(record)
        print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self._writer is not None:
            for name, value in metrics.items():
                self._writer.add_scalar(
                    f"{split}/{name}", float(value), global_step=epoch
                )
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None


def weight_summaries(params) -> Dict[str, Dict[str, float]]:
    """Per-leaf weight statistics (mean/std/absmax) — the histogram-free
    analogue of the reference's ``_weights_log``."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        leaf = jnp.asarray(leaf)
        out[name] = {
            "mean": float(jnp.mean(leaf)),
            "std": float(jnp.std(leaf)),
            "absmax": float(jnp.max(jnp.abs(leaf))),
        }
    return out
