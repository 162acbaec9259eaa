"""Probe two eval-harness speedup mechanisms on the axon backend:

1. persistent compilation cache (jax_compilation_cache_dir) — does a second
   compile of the same program become ~free?
2. concurrent AOT compiles from threads — does the remote compile service
   overlap them (wall(2 parallel) << 2 x wall(1))?
"""
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = "/tmp/pcaudio_jax_cache_probe"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from pcaudio.dsp.featurize import FeaturizeConfig, featurize_batch

    rng = np.random.default_rng(0)
    B, L = 80, 220672
    wj = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lj = jax.device_put(jnp.full((B,), L, jnp.int32))

    jf = jax.jit(featurize_batch, static_argnames=("cfg",))

    def compile_cfg(N, F):
        import math
        n_fft = 2 ** int(math.ceil(math.log2(N)))
        cfg = FeaturizeConfig(
            fs=44100, target_fs=None if F == 44100 else F, n_fft=n_fft,
            win_length=N, hop_length_override=int(N * 0.5),
            mag_norm=float(N), top_db=60.0, trim=True)
        t0 = time.perf_counter()
        exe = jf.lower(wj, lj, cfg=cfg).compile()
        return time.perf_counter() - t0, exe

    # serial baseline: two distinct configs
    t1, _ = compile_cfg(1843, 32000)
    print(f"serial compile A: {t1:.1f}s", flush=True)
    t2, _ = compile_cfg(1433, 32000)
    print(f"serial compile B: {t2:.1f}s", flush=True)

    # parallel: two more distinct configs from two threads
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(compile_cfg, 1228, 22050)
        f2 = ex.submit(compile_cfg, 1024, 22050)
        ta, _ = f1.result()
        tb, _ = f2.result()
    wall = time.perf_counter() - t0
    print(f"parallel 2 compiles: wall {wall:.1f}s (individual {ta:.1f}/{tb:.1f})",
          flush=True)

    # 4-way parallel
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as ex:
        futs = [ex.submit(compile_cfg, n, 11025)
                for n in (2048, 1843, 1638, 1433)]
        for f in futs:
            f.result()
    wall4 = time.perf_counter() - t0
    print(f"parallel 4 compiles: wall {wall4:.1f}s", flush=True)

    # persistent cache: recompile config A in THIS process after clearing
    jax.clear_caches()
    t3, _ = compile_cfg(1843, 32000)
    print(f"recompile A after clear_caches (cache hit?): {t3:.1f}s", flush=True)
    nf = sum(len(fs) for _, _, fs in os.walk(cache_dir))
    print(f"cache dir entries: {nf}", flush=True)


if __name__ == "__main__":
    main()
