"""Subprocess target for the SIGKILL fault-injection resume test.

Runs a tiny 4-epoch ``fit`` with per-epoch checkpoints.  With
``kill_at_epoch >= 0`` the process hard-kills itself (``SIGKILL`` — no
exception unwinding, no atexit, no checkpoint flush) inside the log
callback of that train epoch, i.e. after the epoch's compute but BEFORE
its checkpoint is written: the crash-consistency case where the latest
work is lost and resume must redo it from the last durable checkpoint.

Usage: python _fit_crash_child.py <checkpoint_dir> <kill_at_epoch>
"""

import json
import os
import signal
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

import numpy as np  # noqa: E402

from davo_tpu.solve import BFGSConfig  # noqa: E402
from davo_tpu.train import CalibrationExperiment, fit  # noqa: E402


def make_config() -> CalibrationExperiment:
    return CalibrationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=16,
        batch_size=4,
        batches_per_epoch=2,
        val_batches=1,
        epochs=4,
        solver=BFGSConfig(
            iterations=2,
            training_iterations=1,
            line_search_iterations=4,
            drop_path_p=0.0,
        ),
    )


def main() -> None:
    ckpt_dir = sys.argv[1]
    kill_at = int(sys.argv[2])

    def log_fn(split, epoch, metrics):
        print(json.dumps({"split": split, "epoch": epoch}), flush=True)
        if split == "train" and epoch == kill_at:
            # hard kill: the checkpoint for this epoch has NOT been saved
            # yet (fit checkpoints after the log callback)
            os.kill(os.getpid(), signal.SIGKILL)

    state, history = fit(
        make_config(), checkpoint_dir=ckpt_dir, checkpoint_every=1,
        log_fn=log_fn,
    )
    params_l1 = float(
        sum(
            np.abs(np.asarray(leaf)).sum()
            for leaf in jax.tree_util.tree_leaves(state.params)
        )
    )
    print(
        json.dumps(
            {
                "final": True,
                "train_loss": history["train"][-1]["loss"],
                "val_loss": history["val"][-1]["loss"],
                "step": int(state.step),
                "params_l1": params_l1,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
