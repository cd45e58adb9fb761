"""Test environment: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and pins the TPU ('axon') platform
at interpreter start, so env vars alone are too late — use config.update.
Multi-chip sharding tests run on virtual CPU devices; the real-TPU bench path
is exercised separately by bench.py / __graft_entry__.py.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Never read the shared .jax_cache from tests: a TPU client killed
# mid-write can leave a truncated entry that segfaults
# deserialize_executable, and CPU test compiles are cheap anyway.
jax.config.update("jax_compilation_cache_dir", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
