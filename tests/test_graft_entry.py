"""Driver entry-point tests (subprocess: fresh jax config per run)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_extra=None, timeout=600):
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    env.update(env_extra or {})
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=timeout)


def test_dryrun_multichip_8():
    proc = _run(
        "import importlib.util;"
        "spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py');"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m);"
        "m.dryrun_multichip(8)",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_dryrun_multichip_odd_device_count():
    proc = _run(
        "import importlib.util;"
        "spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py');"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m);"
        "m.dryrun_multichip(3)",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh=(3x1)" in proc.stdout


def test_entry_compiles_small_flagship():
    # GRAFT_ENTRY_MODEL=tiny keeps the CPU compile fast; the driver runs the
    # real flagship on TPU
    proc = _run(
        "import importlib.util, jax;"
        "spec = importlib.util.spec_from_file_location('ge', '__graft_entry__.py');"
        "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m);"
        "fn, args = m.entry();"
        "c = jax.jit(fn).lower(*args).compile();"
        "print('entry compile ok', c.as_text()[:10] is not None)",
        env_extra={"GRAFT_ENTRY_MODEL": "tiny"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "entry compile ok" in proc.stdout
