import hashlib
import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without occupying TPU hardware.  The environment may bake
# JAX_PLATFORMS + a sitecustomize that imports jax at interpreter startup,
# so the env var alone is not enough — use the runtime config switch too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Solver correctness tests need float64 (the reference runs fp64 on CPU).
# Library code is dtype-polymorphic; on TPU it runs in f32/bf16.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def fixed_random_seed(request) -> int:
    """A deterministic per-test seed derived from the test name."""
    digest = hashlib.sha256(request.node.name.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "big")


@pytest.fixture()
def rng(fixed_random_seed) -> np.random.Generator:
    return np.random.default_rng(fixed_random_seed)


@pytest.fixture()
def key(fixed_random_seed):
    return jax.random.key(fixed_random_seed)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (the full nightly tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (skipped by default; enable with --runslow)",
    )


def pytest_collection_modifyitems(config, items):
    # ~30-55 s compile-heavy tests are a separate tier so the default
    # suite stays well under the 2-CPU driver's time budget (VERDICT r2)
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
