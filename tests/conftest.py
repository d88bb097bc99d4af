"""Test configuration.

Forces JAX onto the CPU backend with 8 virtual devices, so sharding /
multi-chip tests run without TPU hardware (the standard fake-multi-device
recipe; SURVEY.md section 4, point 5).

Note: this environment boots an `axon` TPU platform from sitecustomize,
which imports jax at interpreter start — so JAX_PLATFORMS env tweaks are
too late. ``jax.config.update('jax_platforms', ...)`` still works as long
as no backend has been initialized, and XLA_FLAGS is read at CPU-client
creation, which also hasn't happened yet.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("TPU_INSPECT_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
    # Isolate the CPU test runs' persistent compilation cache from the
    # TPU sessions' cache: processes attached to the remote TPU service
    # write XLA:CPU AOT entries compiled with the REMOTE host's machine
    # features (+prefer-no-scatter etc.); loading those on this host can
    # SIGILL/segfault (observed as a compile-time crash mid-suite).
    # tpu_inspect reads this env var at import, which happens after
    # conftest. Unconditional assignment: a pre-exported value typically
    # points at the shared TPU-session cache — exactly the poisoned path
    # this isolation exists to avoid.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
        "~/.cache/jax_tpu_inspect_cpu"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
