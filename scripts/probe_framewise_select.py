"""Framewise (F=1025) selection cost on the serving path — the
numbers-backed decision for whether the exact-select Pallas kernel needs to
replace the XLA two-stage top-k at framewise shapes
(`pcaudio/eval/pipeline.py::extract_chunk_clouds`, exact branch).

The framewise XLA path selects on LOG-magnitude (negative domain), which the
kernel's IEEE-code threshold search cannot take directly (non-negative
inputs only); a monotone remap can collapse f32 near-ties and break
bit-parity with ``lax.top_k``.  So the question is whether the XLA top-k is
ever on the framewise critical path.  This measures, at the FST serving
config (n_fft=2048 → F=1025 bins with Nyquist kept, K=256):

  1. the full framewise extract (featurize='xla' + two-stage exact top-k),
  2. the same extract with selection stripped (full grid clouds),
  3. the two-stage top-k alone on the pre-materialized log-mag chunks,
  4. the classifier e2e at this config.
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from pcaudio.eval import TemporalPipelineConfig
from pcaudio.eval.pipeline import extract_chunk_clouds, make_temporal_classifier
from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch, \
    batched_temporal_chunks

print("devices:", jax.devices(), flush=True)

B = int(os.environ.get("B", "256"))
L = 220672
K = int(os.environ.get("K", "256"))
cfg = TemporalPipelineConfig(fs=44100, n_fft=2048, num_frames=10, top_k=K,
                             extraction="exact", stft_precision="default",
                             compute_dtype="bfloat16", featurize="xla")
rng = np.random.default_rng(0)
waves = jax.device_put(jnp.asarray(
    (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))


def timeit(name, fn, *args, iters=10):
    # axon gotcha: block_until_ready returns before device work completes;
    # force a scalar readback to flush the queue (see .claude/skills/verify)
    out = fn(*args)
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


# 1. full framewise extract (includes the two-stage top-k)
jext = jax.jit(lambda w, l: extract_chunk_clouds(w, l, cfg)[0].points)
timeit("framewise extract (w/ 2-stage top-k)", jext, waves, lengths)

# 2. featurize + chunk only (no selection)
fcfg = cfg.featurize_config()


def feat_chunks(w, l):
    lm, fm = featurize_batch(w, l, fcfg)
    return batched_temporal_chunks(lm, fm, cfg.num_frames)[0]


jfeat = jax.jit(feat_chunks)
chunks = timeit("featurize+chunk only", jfeat, waves, lengths)
Bc, C, Nt, F = chunks.shape
print("chunks:", chunks.shape, chunks.dtype, flush=True)

# 3. the two-stage top-k alone on pre-materialized chunks
def two_stage(ch):
    v1, i1 = jax.lax.top_k(ch, K)
    flat_i = i1 + jnp.arange(Nt)[None, None, :, None] * F
    vals, i2 = jax.lax.top_k(v1.reshape(Bc, C, Nt * K), K)
    return vals, jnp.take_along_axis(flat_i.reshape(Bc, C, Nt * K), i2, -1)


dchunks = jax.device_put(chunks)
timeit("two-stage top-k alone", jax.jit(two_stage), dchunks)

# 4. flat exact top-k for comparison
timeit("flat top-k alone",
       jax.jit(lambda ch: jax.lax.top_k(ch.reshape(Bc, C, Nt * F), K)),
       dchunks)
