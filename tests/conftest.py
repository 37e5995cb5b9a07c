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
import jax  # noqa: E402

# The env's sitecustomize force-registers the 'axon' TPU backend, overriding
# JAX_PLATFORMS from the environment — pin the cpu backend via config so
# tests run locally (fast, deterministic) instead of through the TPU tunnel
# with its minutes-long remote compiles.
jax.config.update("jax_platforms", "cpu")

# Numerical parity tests need true-f32 matmuls (JAX's default allows bf16
# passes even for f32 inputs, which quantizes outputs to the bf16 grid).
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def mock_tokenizer():
    from flipped_tpu.text import MockTokenizer
    return MockTokenizer()
