"""Headline benchmark: end-to-end wave → point-cloud → class throughput.

Pipeline (one jitted program, reference 3ST semantics): trim(60 dB) →
STFT(1024) → log-mag → 10-frame temporal chunks → masked top-K point
extraction → Set Transformer (3ST config: 64 inducing points, dim 64,
8 heads, bf16 matmuls) → clip logits averaged over chunks.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is clips/sec/chip over the 10k-clips/sec/chip north-star target
(BASELINE.json; the reference publishes no throughput numbers).

Env knobs: PCAUDIO_BENCH_BATCH (default 512), PCAUDIO_BENCH_TOPK (default
256), PCAUDIO_BENCH_ITERS (default 10), PCAUDIO_BENCH_FUSED (default 1 —
use the fully-fused Pallas ST kernel).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.eval import TemporalPipelineConfig, make_temporal_classifier
    from pcaudio.nn import ST

    B = int(os.environ.get("PCAUDIO_BENCH_BATCH", "512"))
    top_k = int(os.environ.get("PCAUDIO_BENCH_TOPK", "128"))
    iters = int(os.environ.get("PCAUDIO_BENCH_ITERS", "10"))
    fused = os.environ.get("PCAUDIO_BENCH_FUSED", "1") == "1"
    extraction = os.environ.get("PCAUDIO_BENCH_EXTRACTION", "approx")
    stft_precision = os.environ.get("PCAUDIO_BENCH_STFT_PRECISION", "default")
    compute_dtype = os.environ.get("PCAUDIO_BENCH_DTYPE", "bfloat16")

    fs = 44100
    L = 220672  # 5 s ESC-50 clips, padded to a multiple of 1024
    cfg = TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10,
                                 top_k=top_k, extraction=extraction,
                                 stft_precision=stft_precision,
                                 compute_dtype=compute_dtype)
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    waves = (0.1 * rng.standard_normal((B, L))).astype(np.float32)
    lengths = np.full((B,), 220500, np.int32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))

    fn = jax.jit(make_temporal_classifier(model, cfg, use_fused_st=fused))
    dwaves = jax.device_put(jnp.asarray(waves))
    dlengths = jax.device_put(jnp.asarray(lengths))

    def sync(x):
        # On the tunneled axon platform block_until_ready can return before
        # remote execution finishes; fetching a scalar reduction is a true
        # sync with negligible transfer.
        return float(jnp.sum(x))

    # warmup / compile
    sync(fn(params, dwaves, dlengths))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, dwaves, dlengths)
    sync(out)
    dt = time.perf_counter() - t0

    clips_per_sec = B * iters / dt
    print(json.dumps({
        "metric": "e2e_wave_to_class_throughput",
        "value": round(clips_per_sec, 1),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / 10000.0, 4),
    }))


if __name__ == "__main__":
    main()
