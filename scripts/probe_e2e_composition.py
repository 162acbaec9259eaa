"""Decompose the bench e2e (99.2 ms at B=1024) into honestly-attributed
stages: BENCH_r03 recorded featurize_extract=39.3 + st_forward=61.9(masked!)
vs e2e=99.2, but serving calls the ST mask-free (~16 ms measured) — so
~44 ms of the composed program is unattributed.  This times each prefix of
the real composition at the exact bench shapes to find where it goes.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from pcaudio.eval import TemporalPipelineConfig, make_temporal_classifier
from pcaudio.eval.pipeline import extract_chunk_clouds, _chunk_logits
from pcaudio.nn import ST
from pcaudio.ops.kernels.fused_st import fused_st_forward

print("devices:", jax.devices(), flush=True)

B = int(os.environ.get("B", "1024"))
L = 220672
fs = 44100
cfg = TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10, top_k=128,
                             extraction="exact", stft_precision="default",
                             compute_dtype="bfloat16", featurize="fused")
model = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=64,
           dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
rng = np.random.default_rng(0)
waves = jax.device_put(jnp.asarray(
    (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
lengths = jax.device_put(jnp.full((B,), min(220500, L), jnp.int32))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return out


# 1. extraction, ALL outputs live (no DCE benefit)
jext_full = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg))
(cloud, cmask) = timeit("extract (points+mask+chunk_mask)", jext_full,
                        waves, lengths)
print("points shape:", cloud.points.shape, cloud.points.dtype, flush=True)

# 2. extraction, points only (what bench times — DCE may prune)
jext_pts = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg)[0].points)
timeit("extract (points only)", jext_pts, waves, lengths)

# 3. ST mask-free on pre-extracted points, default block_b and 32
pts = jax.device_put(cloud.points)
for bb in (16, 32):
    jst = jax.jit(lambda p, x, b=bb: fused_st_forward(
        p, x, None, num_heads=8, block_b=b))
    timeit(f"st mask-free bb={bb}", jst, params, pts)

# 4. extract + ST, no chunk averaging
jchunk = jax.jit(lambda p, w, l: _chunk_logits(p, w, l, model, cfg, True)[0])
timeit("extract+st (chunk logits)", jchunk, params, waves, lengths)

# 5. full classifier (the bench e2e)
jfull = jax.jit(make_temporal_classifier(model, cfg, use_fused_st=True))
timeit("full e2e", jfull, params, waves, lengths)
