"""Regression tests for the driver entry points (VERDICT round 1, item 1).

The driver invokes ``dryrun_multichip(8)`` in a fresh process with NO env
flags — round 1 failed rc=1 because the entry asserted instead of
self-configuring 8 virtual CPU devices.  These tests reproduce the driver's
invocation shape: a fresh interpreter, flag-free environment (no
JAX_PLATFORMS, no XLA_FLAGS, no jax_num_cpu_devices), calling the entry the
exact way the driver does.

PYTHONPATH is cleared so the subprocess does not claim the real TPU via the
axon sitecustomize (TPU jobs must stay serialized on this host); the
config-update path exercised here is identical either way — the axon-active
variant was verified manually and is what tests/conftest.py relies on.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy compile/training; fast tier = -m 'not e2e and not slow'

import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _flag_free_env():
    env = {
        "HOME": os.environ.get("HOME", "/root"),
        "PATH": os.environ["PATH"],
        "PYTHONPATH": "",
    }
    return env


def test_dryrun_multichip_driver_invocation():
    """python -c "import __graft_entry__; dryrun_multichip(8)" with no flags."""
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO,
        env=_flag_free_env(),
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip OK on 8 devices" in proc.stdout


def test_dryrun_multichip_after_backend_init_falls_back_to_subprocess():
    """If entry() already initialized a 1-device backend, dryrun re-execs."""
    code = (
        "import __graft_entry__ as g\n"
        "import jax\n"
        "fn, args = g.entry()\n"
        "jax.jit(fn)(*args)\n"
        "assert len(jax.devices()) < 8\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_flag_free_env(),
        capture_output=True,
        text=True,
        timeout=570,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "re-exec in subprocess" in proc.stdout
    assert "dryrun_multichip OK on 8 devices" in proc.stdout
