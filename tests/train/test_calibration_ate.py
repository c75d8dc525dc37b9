import pytest
import jax
import numpy as np

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import (
    CalibrationExperiment,
    create_train_state,
    evaluate_calibration_ate,
)

TINY = CalibrationExperiment(
    num_views=3,
    num_points=4,
    hidden_size=16,
    batch_size=4,
    solver=BFGSConfig(
        error_threshold=1e-7,
        iterations=5,
        drop_path_p=0.0,
        line_search_iterations=8,
    ),
)


@pytest.mark.slow
def test_ate_metrics_shape_and_finiteness(key):
    network, state = create_train_state(TINY, key)
    out = evaluate_calibration_ate(network, state, TINY, key, batches=2)
    assert set(out) == {
        "ate_rmse_mean",
        "ate_rmse_median",
        "f_error_mean",
        "centre_error_mean",
    }
    for v in out.values():
        assert np.isfinite(v), out
    assert out["ate_rmse_median"] >= 0.0
