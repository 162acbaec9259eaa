"""Sub-stage timing of the FUSED serving pipeline (real TPU, bench config)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.eval.pipeline import (TemporalPipelineConfig,
                                       extract_chunk_clouds)
    from pcaudio.ops.kernels.featurize import fused_chunk_mag2

    B, L, fs = 512, 220672, 44100
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

    def bench(name, fn, *args, iters=10):
        jf = jax.jit(fn)
        sync(jf(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
        return out

    def fmag(w, l):
        return fused_chunk_mag2(w, l, n_fft=1024, num_frames=10,
                                out_dtype=jnp.bfloat16,
                                compute_dtype=jnp.bfloat16)

    bench("fused_chunk_mag2 (bf16)", fmag, waves, lengths)

    def sel(w, l):
        m2, cm = fmag(w, l)
        Bq, C, Nt, F = m2.shape
        mags = m2.reshape(Bq, C, Nt * F)
        return jax.lax.approx_max_k(mags, 128, recall_target=0.95), cm

    bench("... + approx_max_k(0.95)", sel, waves, lengths)

    cfg = TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10,
                                 top_k=128, extraction="approx",
                                 featurize="fused",
                                 stft_precision="default",
                                 compute_dtype="bfloat16")
    bench("full fused extract (pipeline)",
          lambda w, l: extract_chunk_clouds(w, l, cfg), waves, lengths)

    # resident selection comparison
    (m2, cm) = jax.jit(fmag)(waves, lengths)
    mflat = jax.device_put(m2.reshape(B, m2.shape[1], -1))
    for rt in (0.99, 0.95, 0.9, 0.8):
        bench(f"approx_max_k rt={rt} (resident bf16)",
              lambda m, rt=rt: jax.lax.approx_max_k(m, 128, recall_target=rt),
              mflat)
    bench("exact top_k (resident bf16)",
          lambda m: jax.lax.top_k(m, 128), mflat)


if __name__ == "__main__":
    main()
