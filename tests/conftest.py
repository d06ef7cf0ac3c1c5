"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere (SURVEY.md §4: sharding
is testable without a TPU pod via xla_force_host_platform_device_count).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A pytest plugin may have imported jax already; the XLA backend is only
# initialized on first use, so env vars + config.update still take effect —
# but fail loudly if a backend is somehow already live on the wrong platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8, (
        f"expected 8 virtual CPU devices, got {devs}; JAX backend was "
        "initialized before conftest.py could configure it."
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
