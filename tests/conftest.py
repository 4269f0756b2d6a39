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

import pytest  # noqa: E402


@pytest.fixture
def hp():
    from multilingual_text_to_speech_tpu.config import HParams

    return HParams()
