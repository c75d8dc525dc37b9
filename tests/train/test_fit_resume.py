"""fit() failure recovery: periodic full-state checkpoints + auto-resume."""

import jax
import numpy as np

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import CalibrationExperiment, fit


def _config():
    return CalibrationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=16,
        batch_size=4,
        batches_per_epoch=2,
        val_batches=1,
        epochs=4,
        solver=BFGSConfig(
            iterations=2, training_iterations=1, line_search_iterations=4,
            drop_path_p=0.0,
        ),
    )


def test_fit_checkpoints_and_resumes(tmp_path):
    config = _config()
    ckpt = str(tmp_path / "run")

    # simulate a preempted run: only the first 2 epochs complete
    state_a, hist_a = fit(
        config, epochs=2, checkpoint_dir=ckpt, checkpoint_every=2
    )
    assert len(hist_a["train"]) == 2

    # a fresh fit pointed at the same dir resumes at epoch 2 and runs the
    # remaining 2 epochs (history holds only the resumed epochs)
    state_b, hist_b = fit(config, checkpoint_dir=ckpt, checkpoint_every=2)
    assert len(hist_b["train"]) == 2
    assert int(state_b.step) == 4 * config.batches_per_epoch

    # the resumed final state matches an uninterrupted run's step count
    # and produces finite metrics
    assert np.isfinite(hist_b["train"][-1]["loss"])

    # the optimiser state round-tripped (adam moments are non-zero)
    leaves = jax.tree_util.tree_leaves(state_b.opt_state)
    assert any(float(np.max(np.abs(np.asarray(l)))) > 0 for l in leaves)
