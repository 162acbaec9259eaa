"""REAL multi-process (DCN-path) validation on CPU.

Spawns two OS processes, each a separate "host" with 2 virtual CPU devices,
connected through ``jax.distributed`` over localhost TCP — the same runtime
and collective path a multi-host TPU pod uses over DCN.  Each process feeds
only its own batch shard (``global_batch_array``); the jitted data-parallel
loss must psum across the process boundary and both processes must agree
with the single-process reference.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

from pcaudio.parallel.multihost import (global_mesh, global_batch_array,
                                        local_batch_slice)

mesh = global_mesh()
B = 8
rng = np.random.default_rng(0)           # same data generated on both hosts
x_all = rng.standard_normal((B, 16)).astype(np.float32)
w = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))

sl = local_batch_slice(B)
batch = global_batch_array(mesh, {"x": x_all[sl]})

@jax.jit
def mean_loss(w, x):
    return jnp.mean((x @ w) ** 2)       # global mean → cross-process psum

got = float(mean_loss(w, batch["x"]))
ref = float(np.mean((x_all @ np.asarray(w)) ** 2))
assert abs(got - ref) < 1e-5, (got, ref)
print(f"proc {pid} OK {got:.6f}", flush=True)
"""


_TRAIN_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
from pcaudio.nn import ST
from pcaudio.parallel.multihost import (global_mesh, global_batch_array,
                                        local_batch_slice)
from pcaudio.train import TrainState, jit_train_step, make_train_step
from pcaudio.train.glue import pointcloud_apply

model = ST(dim_input=2, dim_output=4, num_inds=4, dim_hidden=8, num_heads=2)
params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
opt = optax.sgd(1e-2)   # SGD: Adam amplifies summation-order noise
step = make_train_step(pointcloud_apply(model), opt)

B = 8
rng = np.random.default_rng(0)           # same data on both hosts
pts_all = rng.standard_normal((B, 16, 2)).astype(np.float32)
lbl_all = rng.integers(0, 4, B).astype(np.int32)

# single-process reference: the full batch, no mesh
s_ref = TrainState.create(params, opt)
s_ref, m_ref = jit_train_step(step, donate_state=False)(
    s_ref, {"points": jnp.asarray(pts_all), "labels": jnp.asarray(lbl_all)},
    jax.random.key(1))

# 2-process run: each host feeds ONLY its own shard; the jitted REAL model
# train step must psum grads across the process boundary
mesh = global_mesh()
sl = local_batch_slice(B)
batch = global_batch_array(mesh, {"points": pts_all[sl],
                                  "labels": lbl_all[sl]})
s_dp = TrainState.create(params, opt)
s_dp, m_dp = jit_train_step(step, mesh=mesh, donate_state=False)(
    s_dp, batch, jax.random.key(1))

assert abs(float(m_dp["loss"]) - float(m_ref["loss"])) < 1e-5
for a, b in zip(jax.tree.leaves(s_dp.params), jax.tree.leaves(s_ref.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
print(f"proc {pid} OK train", flush=True)
"""


def _run_two_process(tmp_path, worker_src, tag):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / f"worker_{tag}.py"
    script.write_text(worker_src)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = "/root/repo:" + env["PYTHONPATH"]
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out


def test_two_process_real_train_step(tmp_path):
    """Cross-process update equivalence for the REAL ST train step (not a toy
    loss): 2 hosts × 2 devices, each feeding only its local shard, must
    produce the same parameters as unsharded single-process training."""
    _run_two_process(tmp_path, _TRAIN_WORKER, "train")


def test_two_process_data_parallel(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2")
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = "/root/repo:" + env["PYTHONPATH"]
    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
