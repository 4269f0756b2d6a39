"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip hardware is unavailable in CI; sharding tests run against
``xla_force_host_platform_device_count=8`` virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture
def hp():
    from multilingual_text_to_speech_tpu.config import HParams

    return HParams()
