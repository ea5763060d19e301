"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 verdict item 1: the driver invokes ``dryrun_multichip(8)`` in its own
interpreter where the sandbox sitecustomize has already force-registered the
remote-TPU backend and JAX_PLATFORMS=axon.  The entry must self-configure the
8-device virtual CPU mesh regardless of env, including when a backend was
already initialized before it gets control.  These tests exec the entry in
fresh subprocesses to reproduce the driver's conditions exactly.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)


def _run(code: str, strip_flags: bool) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    if strip_flags:
        # simulate the driver: no conftest-provided XLA_FLAGS / platform hints
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


@pytest.mark.slow
def test_dryrun_multichip_fresh_interpreter():
    proc = _run(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)",
        strip_flags=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    # hardest case: a 1-device backend is already live when the entry runs
    proc = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) >= 1\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n",
        strip_flags=True,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
