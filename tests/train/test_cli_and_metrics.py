import json
import subprocess
import sys
import os

import jax.numpy as jnp
import numpy as np
import pytest

from davo_tpu.train import MetricsLogger, weight_summaries
from davo_tpu.train import save_checkpoint, restore_checkpoint, latest_step


def test_metrics_logger_writes_jsonl(tmp_path, capsys):
    path = tmp_path / "metrics.jsonl"
    logger = MetricsLogger(str(path))
    logger("train", 0, {"loss": 1.5})
    logger("val", 0, {"loss": jnp.asarray(2.5)})
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["split"] == "train" and lines[0]["loss"] == 1.5
    assert lines[1]["loss"] == 2.5
    out = capsys.readouterr().out
    assert "loss" in out


def test_metrics_logger_tensorboard(tmp_path):
    tb_dir = tmp_path / "tb"
    logger = MetricsLogger(tensorboard_dir=str(tb_dir))
    logger("train", 0, {"loss": 1.0})
    logger("val", 0, {"loss": 2.0})
    logger.close()
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_weight_summaries():
    params = {"dense": {"kernel": jnp.asarray([[1.0, -3.0]])}}
    out = weight_summaries(params)
    (name, stats), = out.items()
    assert "kernel" in name
    np.testing.assert_allclose(stats["absmax"], 3.0)


def test_weight_summaries_handles_sequence_nodes():
    # regression: SequenceKey indices are ints and must be stringified
    params = {"layers": [jnp.ones(2), jnp.zeros(3)], "pair": (jnp.ones(1),)}
    out = weight_summaries(params)
    assert len(out) == 3
    assert all(np.isfinite(s["mean"]) for s in out.values())


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(7)}
    save_checkpoint(str(tmp_path), 3, state)
    save_checkpoint(str(tmp_path), 10, state)
    assert latest_step(str(tmp_path)) == 10
    restored = restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(4.0))
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(str(tmp_path / "missing"))


def test_checkpoint_pickle_format_roundtrip(tmp_path):
    # round-1 legacy format (the shipped artifact checkpoints) stays
    # writable and readable alongside orbax directories
    state = {"params": {"w": jnp.arange(3.0)}}
    path = save_checkpoint(str(tmp_path), 5, state, format="pickle")
    assert path.endswith("checkpoint_5.pkl")
    save_checkpoint(str(tmp_path), 7, state)  # orbax
    assert latest_step(str(tmp_path)) == 7
    restored = restore_checkpoint(str(tmp_path), 5)
    np.testing.assert_array_equal(restored["params"]["w"], np.arange(3.0))


def test_checkpoint_sharded_restore_across_mesh_shapes(tmp_path):
    # Save a state sharded over an 8-way data axis, restore it directly
    # onto a differently-shaped (4, 2) mesh without a host round-trip.
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    assert devices.size == 8
    mesh_a = Mesh(devices.reshape(8), ("dp",))
    w = jnp.arange(16.0 * 4).reshape(16, 4)
    sharded = jax.device_put(w, NamedSharding(mesh_a, P("dp", None)))
    state = {"params": {"w": sharded}, "step": jnp.asarray(3)}
    save_checkpoint(str(tmp_path), 1, state)

    mesh_b = Mesh(devices.reshape(4, 2), ("a", "b"))
    target = NamedSharding(mesh_b, P("a", "b"))
    abstract = {
        "params": {
            "w": jax.ShapeDtypeStruct(w.shape, w.dtype, sharding=target)
        },
        "step": jax.ShapeDtypeStruct((), jnp.asarray(3).dtype),
    }
    restored = restore_checkpoint(str(tmp_path), 1, abstract_state=abstract)
    assert restored["params"]["w"].sharding == target
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), w)
    assert int(restored["step"]) == 3


def _run_cli(*args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "davo_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        env=env,
        timeout=600,
    )


def test_cli_presets_lists_all():
    result = _run_cli("presets")
    assert result.returncode == 0, result.stderr
    for name in (
        "calibration_from_oracle_matches",
        "bfgs_solver_full_gradient",
        "bfgs_solver_only_error_gradient",
        "mlp_guess",
    ):
        assert name in result.stdout


def test_cli_unknown_command_fails():
    result = _run_cli("explode")
    assert result.returncode != 0


def test_cli_solver_lbfgs_override_converts_config():
    import argparse

    from davo_tpu.cli import _apply_overrides
    from davo_tpu.solve import LBFGSConfig
    from davo_tpu.train import get_preset

    args = argparse.Namespace(solver="lbfgs", lbfgs_history=7)
    cfg = _apply_overrides(
        get_preset("calibration_transformer_curriculum"), args
    )
    assert isinstance(cfg.solver, LBFGSConfig)
    assert cfg.solver.history == 7
    # shared stopping/line-search fields carried over from the preset
    assert cfg.solver.error_threshold == 1e-7
    assert cfg.solver.training_error_threshold == 1e-3
