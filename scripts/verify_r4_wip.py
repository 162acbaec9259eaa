"""Round-4 WIP verify drive (real chip).

1. v7 fused-ST kernel vs the shipped FST torch checkpoint: argmax agreement
   and logit deviation on real checkpoint weights, v6 vs v7 timing at the
   serving shape.
2. New rank-mask eval engine: a small framewise expt1+expt2 sweep on
   synthetic audio — sanity (full-K point equals no-subsampling accuracy)
   and wall time.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from pcaudio.checkpoint import load_torch_state_dict, st_params
from pcaudio.nn import ST
from pcaudio.ops.kernels.fused_st import fused_st_forward

CKPT = "/root/reference/Code/model_saves/FST(2021-04-26 21_49_40.977943)_net.pth"

print("devices:", jax.devices(), flush=True)

sd = load_torch_state_dict(CKPT)
params = st_params(sd)
model = ST(dim_input=2, dim_output=10, num_inds=64, dim_hidden=64, num_heads=8)

rng = np.random.default_rng(0)
B, K = 256, 128
pts = jnp.asarray(rng.standard_normal((B, K, 2)).astype(np.float32))

ref = model.apply(params, pts)  # XLA f32-ish path on chip
for variant in ("v6", "v7"):
    fn = jax.jit(lambda p, x, v=variant: fused_st_forward(
        p, x, None, num_heads=8, block_b=64, variant=v))
    out = fn(params, pts)
    agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))
    dev = float(jnp.max(jnp.abs(out - ref)))
    # timing: N dispatches then one scalar readback
    fn(params, pts)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        o = fn(params, pts)
    float(jnp.sum(o))
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{variant}: argmax_agree={agree:.4f} max_abs_dev={dev:.3e} "
          f"{dt:.3f} ms/iter ({B} clouds)", flush=True)

# ---- eval engine drive -----------------------------------------------------
from pcaudio.eval.experiments import (
    framewise_expt1, framewise_expt2, make_fst_frame_classifier,
    make_cloud_classifier)

FS, NFFT = 8000, 256
n = 24
waves = jnp.asarray(rng.standard_normal((n, FS)).astype(np.float32) * 0.1)
lengths = jnp.full((n,), FS, jnp.int32)
labels = jnp.asarray(rng.integers(0, 10, n).astype(np.int32))

sd2 = {k: v for k, v in sd.items()}
fclf = make_fst_frame_classifier(model, params)
cclf = make_cloud_classifier(model, params)

t0 = time.perf_counter()
e1 = framewise_expt1(fclf, waves, lengths, labels, fsog=FS, Nfft=NFFT,
                     list_Fs=[FS, 0.5 * FS], list_N=[NFFT, NFFT // 2])
t1 = time.perf_counter()
print(f"expt1 (4 pts): {t1 - t0:.1f}s data={e1['data']}", flush=True)

t0 = time.perf_counter()
rnd, mx = framewise_expt2(fclf, cclf, waves, lengths, labels, fsog=FS,
                          Nfft=NFFT, mode="cloud", nruns=10,
                          list_K=[8, 32, NFFT // 2 + 1])
t1 = time.perf_counter()
full_k = mx["data"][NFFT // 2 + 1][0]
base = e1["data"][FS][0]
print(f"expt2 cloud (3 K x 10 runs): {t1 - t0:.1f}s "
      f"fullK={full_k:.4f} base={base:.4f} match={abs(full_k - base) < 1e-9}",
      flush=True)
print(json.dumps({"ok": True}))
