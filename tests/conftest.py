"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's
host-platform device emulation (the substitute for the reference's
nonexistent multi-node testing — see SURVEY.md §4).

Must run before the first ``import jax`` anywhere in the test process.
"""

import os

# Force CPU: the harness presets JAX_PLATFORMS=axon (one exclusive TPU chip);
# tests must not grab it (bench.py does).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
