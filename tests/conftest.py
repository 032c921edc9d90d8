"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware and must exercise multi-device sharding;
``xla_force_host_platform_device_count=8`` is the standard stand-in for a pod
(SURVEY.md §4).  jax is pre-imported by the environment's sitecustomize, so
configuration goes through ``jax.config.update`` (env vars would be too late);
XLA_FLAGS still works because backends initialize lazily.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
# The bit-exact validation path accumulates in int64 (the reference's power_t,
# constants.h:6); the float hot path pins float32 explicitly throughout.
jax.config.update("jax_enable_x64", True)

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    """Per-test deterministic RNG: seeds derive from the test name, so tests
    are order-independent (a session-scoped stream would make every test's
    draws depend on which tests ran before it)."""
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFFFFFF
    return np.random.default_rng(seed)
