"""Probe: in-kernel cost of re-viewing frame rows as flat chunk blocks.

The featurize+select fusion needs the per-clip spectrum rows
``[C·Nt, F]`` (10-sublane frame rows) re-viewed as flat per-chunk lane
blocks ``[C, Nt·F/128, 128]`` INSIDE the kernel.  On Mosaic that reshape
moves data across sublane/lane tiles; this measures whether it is
µs-noise or a disqualifying relayout, against a pass-through baseline.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, Nt, F = 512, 43, 10, 512
    nb = Nt * F // 128
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, C * Nt, F)).astype(np.float32)))

    def k_pass(x_ref, o_ref):
        o_ref[0] = x_ref[0] + 1.0

    def k_reshape(x_ref, o_ref):
        v = x_ref[0]                                  # [C·Nt, F]
        o_ref[0] = v.reshape(C, nb, 128) + 1.0

    def build(kern, oshape):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, C * Nt, F), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,) + oshape, lambda i: (i,) + (0,) * len(oshape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B,) + oshape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=64 * 1024 * 1024),
        )

    def bench(name, fn, *args, iters=10):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        out = jf(*args)
        float(jnp.sum(out))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:22s} {dt*1e3:8.2f} ms (compile {compile_s:.1f}s)",
              flush=True)

    bench("pass-through", build(k_pass, (C * Nt, F)), x)
    bench("frame->chunk reshape", build(k_reshape, (C, nb, 128)), x)

    a = np.asarray(jax.jit(build(k_reshape, (C, nb, 128)))(x)[0])
    b = np.asarray(x[0]).reshape(C, nb, 128) + 1.0
    print("reshape correct:", bool(np.allclose(a, b)), flush=True)


if __name__ == "__main__":
    main()
