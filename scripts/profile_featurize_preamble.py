"""Split fused_chunk_mag2 cost: XLA preamble (trim, patch frames) vs kernel."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from pcaudio.dsp.trim import trim_bounds
from pcaudio.ops.kernels.featurize import fused_chunk_mag2


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0][..., :8].astype(jnp.float32)))


def bench(name, fn, *args, iters=10):
    jf = jax.jit(fn)
    sync(jf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    B, L = 512, 220672
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))

    bench("full fused_chunk_mag2 (trim=True)",
          lambda w, l: fused_chunk_mag2(w, l, n_fft=1024, num_frames=10,
                                        out_dtype=jnp.bfloat16,
                                        compute_dtype=jnp.bfloat16),
          waves, lengths)
    bench("fused_chunk_mag2 (trim=False)",
          lambda w, l: fused_chunk_mag2(w, l, n_fft=1024, num_frames=10,
                                        trim=False,
                                        out_dtype=jnp.bfloat16,
                                        compute_dtype=jnp.bfloat16),
          waves, lengths)
    bench("trim_bounds alone",
          lambda w, l: jax.vmap(functools.partial(trim_bounds,
                                                  top_db=60.0))(w, l),
          waves, lengths)

    start = jnp.zeros((B,), jnp.int32)
    tlen = lengths.astype(jnp.int32)

if __name__ == "__main__":
    main()
