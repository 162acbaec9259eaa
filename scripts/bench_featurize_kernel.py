"""Time the fused featurize kernel at the serving config (real TPU).

History: a cyclic-roll right-boundary formulation (2 dynamic f32 rolls +
constant lane flip instead of 3 iota-equality map matmuls) was measured
here at 13.58 vs 13.20 ms/batch with exact parity — the boundary builds
are not on the kernel's critical path, so the one-hot form is the only
one kept (see ops/kernels/featurize.py).
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.ops.kernels import featurize as fz

    B, L = 512, 220672
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))

    def sync(x):
        return float(jnp.sum(x[0][..., :4].astype(jnp.float32)))

    def fn(w, l):
        return fz.fused_chunk_mag2(w, l, n_fft=1024, num_frames=10)

    jf = jax.jit(fn)
    t0 = time.perf_counter()
    sync(jf(waves, lengths))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = jf(waves, lengths)
    sync(out)
    print(f"fused featurize: {(time.perf_counter()-t0)/10*1e3:.2f} ms/batch",
          flush=True)


if __name__ == "__main__":
    main()
