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

import resource

# XLA:CPU's LLVM pipeline segfaults compiling the largest fused
# executables (the keyframe chain) under the default 8 MB stack — deep
# recursion during instruction selection. The main thread's stack grows
# on demand up to RLIMIT_STACK on Linux, so raising the soft limit here
# fixes it for the whole run (reproduced: test_line_system's chain
# compile crashed at 8 MB, passed at 128 MB).
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = 128 * 1024 * 1024
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        _new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
        resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))
except Exception:
    pass

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# NO persistent compilation cache for the CPU suite, deliberately.
# XLA:CPU AOT reload is unreliable in this jax build: reloading entries
# — even ones WRITTEN BY THIS MACHINE in the same session — warns
# "Target machine feature +prefer-no-scatter is not supported on the
# host machine" and intermittently SEGFAULTS inside
# compilation_cache.get_executable_and_time (observed repeatedly on the
# keyframe-chain executable). A cache that randomly kills the suite is
# worse than recompiling. The TPU cache (bench.py) uses a different
# serialization path and stays enabled.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
