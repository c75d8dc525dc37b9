import dataclasses
import glob
import os

import pytest

from davo_tpu.solve import BFGSConfig
from davo_tpu.train import (
    CalibrationExperiment,
    apply_config_mapping,
    get_preset,
    load_config_yaml,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_flat_overrides():
    cfg = apply_config_mapping(
        CalibrationExperiment(), {"epochs": 7, "head": "transformer"}
    )
    assert cfg.epochs == 7
    assert cfg.head == "transformer"


def test_nested_solver_override_preserves_other_fields():
    base = CalibrationExperiment(
        solver=BFGSConfig(iterations=100, line_search_iterations=50)
    )
    cfg = apply_config_mapping(base, {"solver": {"iterations": 3}})
    assert cfg.solver.iterations == 3
    assert cfg.solver.line_search_iterations == 50


def test_unknown_key_raises():
    with pytest.raises(KeyError, match="not_a_field"):
        apply_config_mapping(CalibrationExperiment(), {"not_a_field": 1})
    with pytest.raises(KeyError, match="bogus"):
        apply_config_mapping(
            CalibrationExperiment(), {"solver": {"bogus": 1}}
        )


def test_yaml_file_selects_preset(tmp_path):
    path = tmp_path / "exp.yaml"
    path.write_text(
        "preset: calibration_transformer_curriculum\n"
        "epochs: 11\n"
        "solver:\n  iterations: 5\n"
    )
    cfg = load_config_yaml(str(path))
    base = get_preset("calibration_transformer_curriculum")
    assert cfg.epochs == 11
    assert cfg.solver.iterations == 5
    assert cfg.head == base.head == "transformer"


def test_empty_yaml_is_default_preset(tmp_path):
    path = tmp_path / "empty.yaml"
    path.write_text("")
    cfg = load_config_yaml(str(path))
    assert cfg == get_preset("calibration_from_oracle_matches")


@pytest.mark.parametrize(
    "config_path",
    sorted(glob.glob(os.path.join(REPO_ROOT, "configurations", "*.yaml"))),
    ids=os.path.basename,
)
def test_shipped_configurations_load(config_path):
    cfg = load_config_yaml(config_path)
    assert dataclasses.is_dataclass(cfg)
    assert cfg.epochs > 0
