"""CLI end-to-end smoke: subcommands run through __main__ on tiny configs."""
import json
import subprocess
import sys

ENV = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
       "PYTHONPATH": "/root/repo", "HOME": "/root"}


def _run(args):
    return subprocess.run([sys.executable, "-m", "pcaudio.cli"] + args,
                          capture_output=True, text=True, env=ENV, timeout=600)


def test_cli_max_regression_runs():
    r = _run(["max-regression", "--steps", "30"])
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert set(out) == {"set_transformer", "deepset_max", "deepset_mean"}


def test_cli_clustering_runs():
    r = _run(["clustering", "--K", "2", "--B", "4", "--num_steps", "20",
              "--mode", "bench"])
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "model_ll" in out and "oracle_ll" in out
