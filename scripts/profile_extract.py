"""Sub-stage timing of the extraction path (real TPU, bench config)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.dsp.featurize import featurize_batch, batched_temporal_chunks
    from pcaudio.eval.pipeline import TemporalPipelineConfig

    B, L, fs = 512, 220672, 44100
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))

    cfg = TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10,
                                 top_k=128, extraction="approx",
                                 stft_precision="default",
                                 compute_dtype="bfloat16")
    fcfg = cfg.featurize_config()

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
        print(f"{name:38s} {dt*1e3:8.2f} ms", flush=True)
        return out

    def feat(w, l):
        lm, fm = featurize_batch(w, l, fcfg)
        return batched_temporal_chunks(lm, fm, 10)

    bench("featurize+chunk", feat, waves, lengths)

    def to_mags(w, l):
        chunks, cm = feat(w, l)
        Bq, C, Nt, F = chunks.shape
        return chunks.reshape(Bq, C, Nt * F), cm

    bench("featurize+chunk+flatten", to_mags, waves, lengths)

    def sel_approx(w, l):
        mags, cm = to_mags(w, l)
        bv, idx = jax.lax.approx_max_k(mags.astype(jnp.bfloat16), 128,
                                       recall_target=0.99)
        return bv, idx, cm

    bench("... + approx_max_k", sel_approx, waves, lengths)

    def sel_coords(w, l):
        bv, idx, cm = sel_approx(w, l)
        F = 512
        farr = jnp.linspace(0, 0.5, F)
        tarr = jnp.linspace(0, 0.12, 10)
        vals = bv.astype(jnp.bfloat16)
        clouds = jnp.stack([farr[idx % F].astype(vals.dtype),
                            tarr[idx // F].astype(vals.dtype), vals], axis=-1)
        return clouds, cm

    bench("... + coords/stack (full extract)", sel_coords, waves, lengths)

    # isolate the selection op on resident data
    mags, cm = jax.jit(to_mags)(waves, lengths)
    mags16 = jax.device_put(mags.astype(jnp.bfloat16))
    bench("approx_max_k alone (resident bf16)",
          lambda m: jax.lax.approx_max_k(m, 128, recall_target=0.99), mags16)
    magsf = jax.device_put(mags.astype(jnp.float32))
    bench("exact top_k alone (resident f32)",
          lambda m: jax.lax.top_k(m, 128), magsf)
    # two-stage exact decomposition
    def two_stage(m):
        Bq, C, NF = m.shape
        v1, i1 = jax.lax.top_k(m.reshape(Bq, C, 10, 512), 128)
        flat_i = i1 + jnp.arange(10)[None, None, :, None] * 512
        vals, i2 = jax.lax.top_k(v1.reshape(Bq, C, 10 * 128), 128)
        idx = jnp.take_along_axis(flat_i.reshape(Bq, C, 10 * 128), i2, axis=-1)
        return vals, idx
    bench("two-stage exact top_k (resident f32)", two_stage, magsf)


if __name__ == "__main__":
    main()
