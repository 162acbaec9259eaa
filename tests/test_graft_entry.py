"""Driver-contract tests for ``__graft_entry__`` — invoked the way the driver
does (bare subprocess, no pytest conftest provisioning, sitecustomize's axon
platform pin in effect).  Round 1 shipped a red MULTICHIP artifact precisely
because nothing tested this path (VERDICT.md weak #1).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bare_env():
    """Driver-like env: inherit the session env (keeps /root/.axon_site on
    PYTHONPATH, per the platform's requirements) but strip the pytest
    conftest's XLA_FLAGS provisioning so the entry must self-provision."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    kept = [
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    ]
    if kept:
        env["XLA_FLAGS"] = " ".join(kept)
    else:
        env.pop("XLA_FLAGS", None)
    # The conftest cannot un-pin jax_platforms for a *sub*process; the real
    # driver runs with the sitecustomize default (axon or none).
    return env


def test_dryrun_multichip_like_the_driver():
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_bare_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout


@pytest.mark.parametrize("n", [1, 2])
def test_dryrun_small_meshes(n):
    """Odd/small device counts must also work (driver may probe several)."""
    code = (
        "import __graft_entry__\n"
        f"__graft_entry__.dryrun_multichip({n})\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_bare_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRYRUN_OK" in proc.stdout
