"""A/B v6 vs v7 fused-ST at the serving shape (bench.py's ST stage):
[B*C=10240, K=128, din=3] 3ST-config clouds, mask-free, various block_b.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from pcaudio.nn import ST
from pcaudio.ops.kernels.fused_st import fused_st_forward

print("devices:", jax.devices(), flush=True)

model = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=64,
           dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
rng = np.random.default_rng(0)
N, K = 10240, 128
pts = jnp.asarray(rng.standard_normal((N, K, 3)).astype(np.float32))

ref = None
for variant in ("v6", "v7"):
    for block_b in (16, 32, 64):
        try:
            fn = jax.jit(lambda p, x, v=variant, b=block_b: fused_st_forward(
                p, x, None, num_heads=8, block_b=b, variant=v))
            out = fn(params, pts)
            if ref is None:
                ref = out
            agree = float(jnp.mean(jnp.argmax(out, -1) == jnp.argmax(ref, -1)))
            t0 = time.perf_counter()
            R = 10
            for _ in range(R):
                o = fn(params, pts)
            float(jnp.sum(o))
            dt = (time.perf_counter() - t0) / R * 1e3
            print(f"{variant} block_b={block_b}: {dt:.2f} ms "
                  f"({dt / N * 1e3:.2f} us/cloud) agree={agree:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{variant} block_b={block_b}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
