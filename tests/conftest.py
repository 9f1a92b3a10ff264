"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the driver's
``dryrun_multichip`` does the same); Pallas kernels fall back to their XLA
reference paths off-TPU and are compared against them in TPU-only tests.
"""
import os

# The axon environment pre-sets JAX_PLATFORMS=axon (the real TPU) and its
# sitecustomize imports jax at interpreter startup, so env vars alone are too
# late — jax.config.update is the reliable switch as long as no backend has
# been initialized yet. Unit tests run on a virtual 8-device CPU platform;
# TPU-vs-reference kernel comparisons live in tests/tpu/ and opt back in via
# DIVERGEN_TEST_TPU=1.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
if not os.environ.get("DIVERGEN_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the e2e model tests cost minutes of XLA
    # compile each; cache across pytest runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
