"""Stage attribution of the fused-ST v6 kernel (PCAUDIO_ST_PROFILE knobs).

Each profile strips one class of work (WRONG results, timing only):
copyonly (I/O floor), projonly (+input projections), noattend (all attend
matmuls skipped), nosoftmax (exp/normalize replaced by a scale),
nohead (head masking/summing replaced by broadcasts).
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.nn import ST
    from pcaudio.ops.kernels.fused_st import fused_st_forward

    N, K = 22016, 128
    rng = np.random.default_rng(0)
    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((N, K, 3)).astype(np.float32)))
    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))

    def sync(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    for profile in ("copyonly", "projonly", "noattend", "nosoftmax",
                    "nohead", ""):
        os.environ["PCAUDIO_ST_PROFILE"] = profile
        f = jax.jit(lambda p, x: fused_st_forward(p, x, None, num_heads=8))
        try:
            sync(f(params, pts))
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(params, pts)
            sync(out)
            dt = (time.perf_counter() - t0) / 10
            print(f"{profile or 'full':12s} {dt*1e3:8.2f} ms "
                  f"({dt/N*1e6:.3f} us/chunk)", flush=True)
        except Exception as e:
            print(f"{profile or 'full'}: FAILED {type(e).__name__}",
                  flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
