"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (SURVEY.md §4 implication).

NB: this environment's sitecustomize force-registers the axon TPU platform
and overwrites JAX_PLATFORMS, so the env var alone is not enough —
`jax.config.update` after import wins (it is applied before first backend
initialization)."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: interpret-mode kernel tests (minutes each on the 1-core "
        "box); the quick loop is `pytest tests/ -q -m 'not slow'`")
