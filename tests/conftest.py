"""Test harness config: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4 'Multi-chip without a pod')."""

import os

# Must be set before jax is imported anywhere. The session environment pins
# JAX_PLATFORMS=axon (the real TPU tunnel); tests always run on virtual CPU
# devices so they are hermetic and can fake an 8-chip mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
