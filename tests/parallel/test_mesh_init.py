"""initialize_distributed error contract (mocked — no cluster on CI)."""

import jax
import pytest

from davo_tpu.parallel import initialize_distributed


def test_explicit_misconfiguration_raises(monkeypatch):
    def boom(**kwargs):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="explicitly configured"):
        initialize_distributed(
            coordinator_address="10.0.0.1:1234", num_processes=4, process_id=0
        )


def test_autodetect_failure_warns_and_continues(monkeypatch):
    def boom(**kwargs):
        raise RuntimeError("no cluster environment detected")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.warns(UserWarning, match="continuing single-process"):
        index = initialize_distributed()
    assert index == jax.process_index()


def test_success_path_returns_process_index(monkeypatch):
    calls = {}

    def fake(**kwargs):
        calls.update(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake)
    index = initialize_distributed(
        coordinator_address="10.0.0.1:1234", num_processes=1, process_id=0
    )
    assert calls["coordinator_address"] == "10.0.0.1:1234"
    assert index == jax.process_index()
