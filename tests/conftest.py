"""Test configuration: force a virtual 8-device CPU platform before JAX loads.

Mirrors the reference's approach of using the CPU path as the reference
implementation for the accelerator path (SURVEY.md §4): tests run on CPU with
8 virtual devices so sharding (shard_map/pjit) is exercised without TPU
hardware; numerical kernels run identically on TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the env var; force the CPU platform explicitly
# (tests must be hermetic + exercise the virtual 8-device mesh).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated on CPU; repeat
# repeat runs hit the cache (measured: ~10 min cold, ~2-4 min warm).
os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not marked `heavy` is the fast tier: `pytest -m fast`
    (W5 — the full suite is compile-dominated on CPU; the fast tier keeps a
    fast warm-cache signal; cold runs are compile-dominated)."""
    for item in items:
        if "heavy" not in item.keywords:
            item.add_marker(pytest.mark.fast)
