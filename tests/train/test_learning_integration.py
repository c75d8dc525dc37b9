"""End-to-end learning smoke: a few epochs of the full fused train step
must reduce the training loss (the closest CPU analogue of the reference's
oracle-match calibration experiment)."""

import numpy as np
import pytest

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import CalibrationExperiment, fit


@pytest.mark.slow
def test_training_reduces_loss():
    config = CalibrationExperiment(
        num_views=3,
        num_points=4,
        hidden_size=64,
        batch_size=16,
        batches_per_epoch=8,
        val_batches=2,
        epochs=4,
        learning_rate=3e-4,
        solver=BFGSConfig(
            error_threshold=1e-7,
            training_error_threshold=1e-3,
            iterations=6,
            training_iterations=3,
            drop_path_p=0.1,
            line_search_iterations=10,
        ),
    )
    _, history = fit(config)
    losses = [h["loss"] for h in history["train"]]
    assert np.isfinite(losses).all()
    # averaged over the last vs first epoch the loss must drop
    assert losses[-1] < losses[0], losses
