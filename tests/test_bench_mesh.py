"""bench.py multi-chip mode on the 8-virtual-device CPU mesh (subprocess —
the shard_map serving path must work exactly as the driver invokes bench).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(mesh):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # bench self-provisions under PCAUDIO_BENCH_CPU
    env.update({
        "PCAUDIO_BENCH_CPU": "1",
        "PCAUDIO_BENCH_MESH": str(mesh),
        "PCAUDIO_BENCH_BATCH": "16",
        "PCAUDIO_BENCH_LEN": "32768",
        "PCAUDIO_BENCH_ITERS": "1",
        "PCAUDIO_BENCH_TOPK": "32",
        "PCAUDIO_BENCH_FUSED": "0",   # XLA model path: fast enough on CPU
        "PCAUDIO_BENCH_STAGES": "0",
    })
    return env


def _run(mesh):
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                          env=_env(mesh), capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, (
        f"bench mesh={mesh} failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_mesh_8_runs_and_reports():
    out = _run(8)
    assert out["unit"] == "clips/sec/chip"
    assert out["config"]["mesh"] == 8
    assert out["value"] > 0


def test_bench_mesh_fused_kernels_under_shard_map():
    """The FUSED serving path (Pallas featurize + pair-packed ST, interpret
    mode on CPU) must compile and run under shard_map on the virtual mesh —
    exactly what multi-chip serving does on real hardware."""
    env = _env(8)
    env.update({
        "PCAUDIO_BENCH_FUSED": "1",
        "PCAUDIO_BENCH_BATCH": "8",
        "PCAUDIO_BENCH_LEN": "16384",
        "PCAUDIO_BENCH_TOPK": "32",
    })
    proc = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                          env=env, capture_output=True, text=True,
                          timeout=900)
    assert proc.returncode == 0, (
        f"fused bench mesh=8 failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["config"]["fused_st"] is True
    assert out["config"]["mesh"] == 8
    assert out["value"] > 0
