"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices BEFORE jax is
imported anywhere, so sharding/multi-chip tests run without TPU hardware
(the standard fake-multi-device recipe; SURVEY.md section 4, point 5).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
