"""Stage attribution of the exact-select kernel at serving shape (bf16).

PCAUDIO_SELECT_PROFILE=searchonly strips everything after the threshold
search (WRONG results, timing only); the difference to the full kernel is
ranks+compaction.  Run for both compaction forms.
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    Bc, Nt, F, K = 22016, 10, 512, 128
    x16 = jax.device_put(jnp.asarray(
        np.abs(rng.standard_normal((Bc, Nt, F))).astype(np.float32)
    ).astype(jnp.bfloat16))

    def sync(v):
        return float(jnp.sum(jax.tree.leaves(v)[0].astype(jnp.float32)))

    def bench(name, fn, *args, iters=10):
        jf = jax.jit(fn)
        sync(jf(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)

    from pcaudio.ops.kernels.select import exact_topk_chunks

    for profile in ("searchonly", ""):
        os.environ["PCAUDIO_SELECT_PROFILE"] = profile
        comps = ("gather", "scatter") if profile == "" else ("gather",)
        for comp in comps:
            bench(f"profile={profile or 'full'} compaction={comp}",
                  lambda m, c=comp: exact_topk_chunks(m, K, compaction=c),
                  x16)
            jax.clear_caches()


if __name__ == "__main__":
    main()
