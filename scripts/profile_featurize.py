"""Per-stage timing of the serving featurize/extraction path (real TPU).

Stages at the bench config (B=512, 5 s 44.1 kHz clips, 3ST temporal
pipeline): trim_bounds / trim / trim+pad / stft / featurize / extraction.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch
    from pcaudio.dsp.framing import pad_center_reflect
    from pcaudio.dsp.trim import trim, trim_bounds
    from pcaudio.eval.pipeline import TemporalPipelineConfig, extract_chunk_clouds

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
        print(f"{name:34s} {dt*1e3:8.2f} ms", flush=True)
        return out

    bench("trim_bounds", jax.vmap(trim_bounds), waves, lengths)
    bench("trim (bounds+materialize)", jax.vmap(trim), waves, lengths)
    bench("trim+pad_center_reflect",
          jax.vmap(lambda w, l: pad_center_reflect(*trim(w, l), 512)),
          waves, lengths)

    fcfg = FeaturizeConfig(fs=fs, n_fft=1024, trim=True,
                           precision="default", out_dtype="bfloat16")
    bench("featurize (trim+stft+log)",
          lambda w, l: featurize_batch(w, l, fcfg), waves, lengths)
    fcfg_notrim = FeaturizeConfig(fs=fs, n_fft=1024, trim=False,
                                  precision="default", out_dtype="bfloat16")
    bench("featurize (no trim)",
          lambda w, l: featurize_batch(w, l, fcfg_notrim), waves, lengths)

    for extraction in ("approx", "exact"):
        cfg = TemporalPipelineConfig(fs=fs, n_fft=1024, num_frames=10,
                                     top_k=128, extraction=extraction,
                                     stft_precision="default",
                                     compute_dtype="bfloat16")
        bench(f"featurize+extract ({extraction})",
              lambda w, l, c=cfg: extract_chunk_clouds(w, l, c),
              waves, lengths)


if __name__ == "__main__":
    main()
