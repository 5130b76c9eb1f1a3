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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The one-command suite used to SEGFAULT deterministically ~73% in
    (tests/test_speculative.py::test_spec_int8_cross_kv) inside XLA:CPU's
    backend_compile_and_load after ~295 tests' worth of in-process jit
    compilations — an accumulation crash (the same file passes in
    isolation, and every post-crash file passes in a fresh process;
    reproduced twice on this box, round-4 verdict weak #1). Hundreds of
    live compiled programs keep their LLVM-JIT'd code resident; clearing
    the jit caches at module teardown bounds that footprint. Cost: tests
    in different modules recompile shared shapes (~10% suite wall);
    correctness is unaffected (caches are pure memoisation)."""
    yield
    jax.clear_caches()
