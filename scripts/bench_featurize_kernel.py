"""Time the fused featurize kernel at the serving config (real TPU).

One number per boundary-frame formulation (PCAUDIO_FEATURIZE_BOUNDARY):
``onehot`` (iota-equality map matmuls) vs ``roll`` (cyclic lane rolls +
constant flip).  Also cross-checks the two produce identical grids for
full-length clips.
"""
import os
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

    outs = {}
    for mode in ("onehot", "roll"):
        os.environ["PCAUDIO_FEATURIZE_BOUNDARY"] = mode

        def fn(w, l):
            return fz.fused_chunk_mag2(w, l, n_fft=1024, num_frames=10)

        jf = jax.jit(fn)
        t0 = time.perf_counter()
        sync(jf(waves, lengths))
        print(f"{mode}: compile {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        for _ in range(10):
            out = jf(waves, lengths)
        sync(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{mode}: {dt*1e3:.2f} ms/batch", flush=True)
        outs[mode] = np.asarray(out[0][:32].astype(jnp.float32))
        jax.clear_caches()  # env is baked into the traced kernel

    d = np.abs(outs["onehot"] - outs["roll"]).max()
    print(f"boundary-mode parity (32 clips): max|d| = {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
