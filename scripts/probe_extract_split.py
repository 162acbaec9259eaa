"""Split the 39.8 ms extract stage (B=1024 serving shape) into its
components: fused featurize kernel, exact-select kernel, coordinate stack.
Round-5 follow-up to scripts/probe_e2e_composition.py — decides where the
extract-side optimization budget goes (featurize vs select vs glue).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from pcaudio.eval import TemporalPipelineConfig
from pcaudio.eval.pipeline import extract_chunk_clouds
from pcaudio.ops.kernels.featurize import fused_chunk_mag2
from pcaudio.ops.kernels.select import exact_topk_chunks

print("devices:", jax.devices(), flush=True)

B = int(os.environ.get("B", "1024"))
L = 220672
cfg = TemporalPipelineConfig(fs=44100, n_fft=1024, num_frames=10, top_k=128,
                             extraction="exact", stft_precision="default",
                             compute_dtype="bfloat16", featurize="fused")
rng = np.random.default_rng(0)
waves = jax.device_put(jnp.asarray(
    (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return out


# 1. featurize kernel alone (wave -> squared-mag chunk grid, bf16)
jfeat = jax.jit(lambda w, l: fused_chunk_mag2(
    w, l, n_fft=1024, num_frames=10, trim=True, top_db=60.0,
    out_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16))
m2, cmask = timeit("featurize (wave->m2 grid)", jfeat, waves, lengths)
Bc, C, Nt, F = m2.shape
print("m2:", m2.shape, m2.dtype, flush=True)

m2flat = jax.device_put(m2.reshape(Bc * C, Nt, F))

# 2. exact-select kernel alone on the pre-materialized grid
jsel = jax.jit(lambda m: exact_topk_chunks(m, 128))
timeit("exact select (m2->topK)", jsel, m2flat)

# 2b. select with scatter/gather forced
for comp in ("scatter", "gather"):
    jc = jax.jit(lambda m, c=comp: exact_topk_chunks(m, 128, compaction=c))
    timeit(f"exact select [{comp}]", jc, m2flat)

# 2c. block_c sweep for the select kernel
for bc in (16, 32, 64):
    jb = jax.jit(lambda m, b=bc: exact_topk_chunks(m, 128, block_c=b))
    timeit(f"exact select block_c={bc}", jb, m2flat)

# 3. XLA two-stage top-k on the same grid, for comparison
def xla_two_stage(m):
    Bn = m.shape[0]
    v1, i1 = jax.lax.top_k(m, 128)
    flat_i = i1 + jnp.arange(Nt)[None, :, None] * F
    vals, i2 = jax.lax.top_k(v1.reshape(Bn, Nt * 128), 128)
    return vals, jnp.take_along_axis(flat_i.reshape(Bn, Nt * 128), i2, -1)

timeit("XLA two-stage top-k", jax.jit(xla_two_stage), m2flat)

# 4. full extract (for the residual = glue: coord stack, log, reshape)
jext = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg)[0].points)
timeit("full extract", jext, waves, lengths)
