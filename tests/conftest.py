"""Test configuration: force a hermetic 8-virtual-device CPU platform.

Mirrors the reference's approach of using the CPU path as the reference
implementation for the accelerator path (SURVEY.md §4): tests run on CPU with
8 virtual devices so sharding (shard_map/pjit) is exercised without TPU
hardware; numerical kernels run identically on TPU.

HERMETICITY RE-EXEC: this environment ships a TPU tunnel sitecustomize that
registers a remote-compile service for EVERY python process
(PALLAS_AXON_REMOTE_COMPILE=1). With it active, even XLA:CPU test
executables are compiled on a remote host with a different CPU
microarchitecture ("Loading XLA:CPU AOT result ... machine type doesn't
match ... could lead to execution errors such as SIGILL") — which manifests
as nondeterministic segfaults on whichever large compile lands late in a
full-suite run. Since the sitecustomize runs at interpreter start (before
conftest), the only reliable fix is to re-exec pytest once with the axon
environment scrubbed.
"""

import os
import sys

if (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_OPTIX_TPU_TEST_REEXEC") != "1"
):
    import subprocess

    env = dict(os.environ)
    env["_OPTIX_TPU_TEST_REEXEC"] = "1"
    for var in (
        "PALLAS_AXON_POOL_IPS",
        "PALLAS_AXON_REMOTE_COMPILE",
        "PALLAS_AXON_TPU_GEN",
        "AXON_LOOPBACK_RELAY",
        "AXON_POOL_SVC_OVERRIDE",
    ):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the repo importable but drop the axon site dir
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in parts:
        parts.append(repo)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env, cwd=repo
    )
    os._exit(rc)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated on CPU; repeat
# runs hit the cache (measured: ~10 min cold, ~2-4 min warm).
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
