"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's
host-platform device emulation (the substitute for the reference's
nonexistent multi-node testing — see SURVEY.md §4).

NOTE on platform forcing: the environment registers a TPU plugin from
sitecustomize at interpreter startup, which reads JAX_PLATFORMS before any
test code runs — setting the env var here is too late. The live config API
still works, and keeps the TPU backend from ever initializing (the chip is
exclusive; tests must not contend with bench.py for it).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-dominated (every
# process re-jits the tracker/mapper/BA for each camera+shape config);
# caching compiled executables on disk cuts repeat runs to a fraction.
try:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/jax_compile_cache_plpslam"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # older jax without the knobs: run uncached
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
