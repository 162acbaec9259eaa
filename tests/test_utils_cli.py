"""Utils (metrics/debugging/profiling) + CLI smoke tests."""
import json
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from pcaudio.utils import (
    MetricsWriter,
    assert_finite_tree,
    check_jit_purity,
    count_parameters,
    dump_reference_json,
    read_metrics,
    time_fn,
)


def test_metrics_writer_roundtrip(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsWriter(p) as w:
        w.write({"loss": 1.5})
        w.write({"loss": 1.0, "acc": 0.5})
    recs = read_metrics(p)
    assert len(recs) == 2
    assert recs[0]["index"] == 0 and recs[1]["loss"] == 1.0
    dump_reference_json({"data": {44100: [0.5]}}, str(tmp_path / "r.json"))
    assert json.load(open(tmp_path / "r.json"))["data"]["44100"] == [0.5]


def test_assert_finite_tree():
    assert_finite_tree({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError, match="a/b"):
        assert_finite_tree({"a": {"b": jnp.array([1.0, np.nan])}})


def test_check_jit_purity_and_time_fn():
    assert check_jit_purity(lambda x: x * 2, jnp.ones(4))
    import jax
    dt, out = time_fn(jax.jit(lambda x: x + 1), jnp.ones(8), iters=2)
    assert dt > 0 and float(out[0]) == 2.0


def test_cli_help_and_max_regression():
    r = subprocess.run(
        [sys.executable, "-m", "pcaudio.cli", "--help"],
        capture_output=True, text=True, env={"JAX_PLATFORMS": "cpu",
                                             "PATH": "/usr/bin:/bin",
                                             "PYTHONPATH": "/root/repo"},
    )
    assert r.returncode == 0
    for cmd in ["train", "eval", "plots", "bench", "modelnet40",
                "clustering", "max-regression"]:
        assert cmd in r.stdout
