"""Test configuration.

Tests run on CPU with 8 virtual devices so every sharding/multi-chip test
works without TPU hardware (SURVEY.md §4: XLA's standard fake-mesh recipe).
Must run before jax initializes its backends, hence top-of-conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: U-Net CPU compiles dominate test wall time.
import jax  # noqa: E402

# The environment's sitecustomize registers a remote "axon" TPU backend and
# overrides JAX_PLATFORMS; force CPU explicitly so tests run on the local
# 8-device virtual mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "tests expect the 8-device virtual CPU mesh"
