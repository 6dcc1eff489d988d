"""Test configuration: force an 8-device CPU mesh before JAX initializes.

This is the fake-backend mechanism for testing v5e-8-style sharding without
TPU hardware (SURVEY.md §4): XLA exposes 8 virtual CPU devices, so every
`jax.sharding.Mesh` test exercises real partitioning + collectives.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Force CPU via jax.config: this image's sitecustomize (/root/.axon_site)
# pins jax_platforms to the axon TPU tunnel, overriding the env var —
# tests must run on the virtual 8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU test compiles dominate wall-clock, and
# they are identical across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-minute tests (subprocess compiles)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
