"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is unavailable in CI; sharding tests run against
``xla_force_host_platform_device_count=8`` virtual CPU devices.
"""

import os

# Force CPU even when the shell exports JAX_PLATFORMS=axon (the real chip):
# unit tests must be hardware-independent and need 8 virtual devices.
# The axon platform plugin ignores the JAX_PLATFORMS env var, so the platform
# must be pinned through jax.config before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by scan/model compiles
# that are identical across runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture
def hp():
    from multilingual_text_to_speech_tpu.config import HParams

    return HParams()
