"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so tests exercise sharding on
XLA's host platform with 8 virtual devices; the same Mesh code runs unchanged
on real ICI-connected chips. The axon TPU plugin ignores the JAX_PLATFORMS
environment variable, so we force the platform through jax.config instead.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Most of the suite's wall time is XLA:CPU compilation; the persistent
# cache cuts a warm re-run to a fraction of the cold one (the cache is
# keyed on HLO + flags, so the 8-device mesh programs cache too).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
