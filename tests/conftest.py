"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Tests validate numerics in f64 against numpy/scipy oracles (the reference is
f64 C++); sharding tests use the 8-device virtual CPU mesh. The environment's
axon TPU plugin forces jax_platforms='axon,cpu' at import, so we override the
config after import rather than via JAX_PLATFORMS.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between modules — the full suite
    accumulates enough XLA compile-cache memory on this 1-vCPU container
    to segfault the compiler around test #90."""
    yield
    jax.clear_caches()
    gc.collect()
