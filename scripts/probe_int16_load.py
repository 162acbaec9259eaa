"""Probe: int16 VMEM blocks + i16→f32 convert inside a Pallas TPU kernel.

If this lowers, the featurize kernel can take PCM int16 waves directly —
halving its input DMA (the single biggest term in its ~6 ms gap to the
DFT-matmul floor) losslessly for 16-bit PCM sources.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref):
        x = x_ref[...].astype(jnp.float32) * (1.0 / 32768.0)
        o_ref[...] = jnp.dot(x, x.T, preferred_element_type=jnp.float32)

    B, L = 64, 512
    x = jnp.asarray((np.random.default_rng(0).integers(
        -32768, 32767, (B, L))).astype(np.int16))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    ref = (np.asarray(x, np.float32) / 32768.0) @ (
        np.asarray(x, np.float32) / 32768.0).T
    err = np.abs(np.asarray(out) - ref).max()
    print(f"int16 load+convert: OK, max|err| = {err:.3e}", flush=True)

    # and a quick DMA-rate comparison at serving-ish shape
    def kern2(x_ref, o_ref):
        c = pl.program_id(0)
        x = x_ref[0].astype(jnp.float32)
        o_ref[c, 0] = jnp.sum(x)

    for dt, name in ((jnp.int16, "int16"), (jnp.float32, "f32")):
        big = jnp.zeros((512, 432, 512), dt)
        f = jax.jit(lambda b: pl.pallas_call(
            kern2,
            grid=(512,),
            out_shape=jax.ShapeDtypeStruct((512, 2), jnp.float32),
            in_specs=[pl.BlockSpec((1, 432, 512), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(b))
        float(jnp.sum(f(big)))
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(big)
        float(jnp.sum(o))
        print(f"{name} wave sweep: {(time.perf_counter()-t0)/10*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
