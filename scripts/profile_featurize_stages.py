"""Stage attribution of the fused featurize kernel
(PCAUDIO_FEATURIZE_PROFILE knobs).

Each profile strips one class of in-kernel work (WRONG results, timing
only) to attribute the kernel's time against its DFT-matmul floor:
dftonly (interior DFT matmuls + scratch + output write alone), notrim
(skip the trim detector), noboundary (skip the two reflect boundary
frames), noswitch (static scratch read instead of the aligned dynamic
window + 8-way switch).
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.ops.kernels.featurize import fused_chunk_mag2

    B, L, true_len = 1024, 220672, 220500
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), true_len, jnp.int32))

    def sync(out):
        return float(jnp.sum(out[0][..., :8].astype(jnp.float32)))

    for profile in ("dftonly", "notrim", "noboundary", "noswitch", ""):
        os.environ["PCAUDIO_FEATURIZE_PROFILE"] = profile
        f = jax.jit(lambda w, n: fused_chunk_mag2(w, n))
        try:
            sync(f(waves, lengths))
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(waves, lengths)
            sync(out)
            dt = (time.perf_counter() - t0) / 10
            print(f"{profile or 'full':12s} {dt*1e3:8.2f} ms "
                  f"({dt/B*1e6:.2f} us/clip)", flush=True)
        except Exception as e:
            print(f"{profile or 'full'}: FAILED {type(e).__name__}: {e}",
                  flush=True)
        finally:
            os.environ.pop("PCAUDIO_FEATURIZE_PROFILE", None)
        jax.clear_caches()


if __name__ == "__main__":
    main()
