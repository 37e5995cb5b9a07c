"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding is exercised without TPU hardware (the TPU-native analog of the
reference's 'world_size=1 degradation' unit mode, SURVEY.md §4)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mock_tokenizer():
    from flipped_tpu.text import MockTokenizer
    return MockTokenizer()
