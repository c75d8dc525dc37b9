"""Run-registry browse/compare surface (MLflow-parity workflow,
reference ``README.md:3-8``): list, final metrics, config diff."""

import json
import os

from davo_tpu.train.runs import (
    compare_runs,
    final_metrics,
    load_registry,
    make_run_manifest,
    metrics_path_for,
    register_run,
)


def _make_run(tmp_path, name, lr, losses, idx):
    metrics_path = str(tmp_path / f"run{idx}_metrics.jsonl")
    ckpt_dir = str(tmp_path / f"ckpt{idx}")
    import sys

    old_argv = sys.argv
    sys.argv = ["cli.py", "fit", "--metrics-file", metrics_path]
    try:
        manifest = make_run_manifest(
            {"learning_rate": lr, "epochs": 2}, name=name
        )
    finally:
        sys.argv = old_argv
    register_run(
        manifest, registry_dir=str(tmp_path / "runs"), checkpoint_dir=ckpt_dir
    )
    with open(metrics_path, "a") as f:
        for epoch, loss in enumerate(losses):
            f.write(
                json.dumps(
                    {
                        "split": "val",
                        "epoch": epoch,
                        "loss": loss,
                        "run_id": manifest["run_id"],
                    }
                )
                + "\n"
            )
    return manifest


def test_registry_roundtrip_and_final_metrics(tmp_path):
    m1 = _make_run(tmp_path, "a", 1e-4, [3.0, 1.0], 1)
    m2 = _make_run(tmp_path, "b", 3e-4, [4.0, 2.0], 2)
    rows = load_registry(str(tmp_path / "runs"))
    assert [r["run_id"] for r in rows] == [m1["run_id"], m2["run_id"]]
    assert metrics_path_for(rows[0]).endswith("run1_metrics.jsonl")
    final = final_metrics(rows[0])
    assert final["val"]["loss"] == 1.0
    assert final["val"]["epoch"] == 1


def test_final_metrics_attributes_by_run_id(tmp_path):
    # two runs appended to the SAME metrics file must not bleed into each
    # other (the MetricsLogger header note)
    m1 = _make_run(tmp_path, "a", 1e-4, [1.0], 1)
    rows = load_registry(str(tmp_path / "runs"))
    path = metrics_path_for(rows[0])
    with open(path, "a") as f:
        f.write(
            json.dumps(
                {"split": "val", "epoch": 9, "loss": 99.0, "run_id": "other"}
            )
            + "\n"
        )
    final = final_metrics(rows[0])
    assert final["val"]["loss"] == 1.0


def test_compare_runs_metrics_and_config_diff(tmp_path):
    _make_run(tmp_path, "a", 1e-4, [3.0, 1.0], 1)
    _make_run(tmp_path, "b", 3e-4, [4.0, 2.0], 2)
    rows = load_registry(str(tmp_path / "runs"))
    out = compare_runs(rows, split="val")
    ids = [r["run_id"] for r in rows]
    assert out["metrics"]["loss"] == {ids[0]: 1.0, ids[1]: 2.0}
    # only the differing config key is reported (epochs agrees)
    assert set(out["config_diff"]) == {"learning_rate"}
    assert out["config_diff"]["learning_rate"] == {
        ids[0]: 1e-4,
        ids[1]: 3e-4,
    }


def test_cli_runs_surface(tmp_path, capsys):
    from davo_tpu.cli import main

    m1 = _make_run(tmp_path, "a", 1e-4, [3.0, 1.0], 1)
    _make_run(tmp_path, "b", 3e-4, [4.0, 2.0], 2)
    reg = str(tmp_path / "runs")
    assert main(["runs", "list", "--registry-dir", reg]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["final_loss"] == 1.0

    assert main(["runs", "show", m1["run_id"], "--registry-dir", reg]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown["run_id"] == m1["run_id"]
    assert shown["final_metrics"]["val"]["loss"] == 1.0

    assert main(["runs", "compare", "--registry-dir", reg]) == 0
    cmp_out = json.loads(capsys.readouterr().out)
    assert "learning_rate" in cmp_out["config_diff"]

    # ambiguous prefix (both start with the date) fails cleanly
    ambiguous = m1["run_id"][:4]
    assert main(["runs", "show", ambiguous, "--registry-dir", reg]) == 1
