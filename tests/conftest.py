"""Test harness config: force CPU with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4 'Multi-chip without a pod')."""

import os

# The session environment pins JAX_PLATFORMS=axon (a real TPU tunnel) and a
# sitecustomize imports jax before this file runs, so jax has already read the
# env. Backends are initialised lazily though, so config.update still wins as
# long as no computation has happened yet. Tests always run on 8 virtual CPU
# devices: hermetic, and enough to fake a v5e-8 mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
