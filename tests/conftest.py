"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The surrounding environment pre-imports jax and pins JAX_PLATFORMS to
the TPU plugin, so env vars are too late -- we must use config updates
(backend initialization is lazy, so this works as long as no test ran
yet).  Multi-device tests rely on xla_force_host_platform_device_count
(SURVEY.md section 4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite is XLA-compile-bound (~90% of
# wall-clock); repeat runs reuse compiled executables and drop from
# ~13 min to a few minutes.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
