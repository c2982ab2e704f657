"""Test configuration: force the CPU backend with a virtual 8-device mesh.

Must run before jax initializes a backend: tests never touch the TPU (the
single chip is reserved for benchmarks) and sharding tests need 8 virtual
devices (`xla_force_host_platform_device_count`).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
