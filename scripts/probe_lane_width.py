"""Probe: MXU/VPU cost of 64-lane vs 128-lane ops in a Pallas kernel.

If [n,64]@[64,64] costs the same as [n,128]@[128,128], pair-packing the
fused-ST kernel (two samples side-by-side on lanes) halves its op count
for free.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, fn, *args, iters=20):
    jf = jax.jit(fn)
    float(jnp.sum(jf(*args)[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.3f} ms", flush=True)


def chain_kernel(x_ref, w_ref, o_ref, *, reps):
    x = x_ref[...]
    w = w_ref[...]
    for _ in range(reps):
        x = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16)
    o_ref[...] = x


def make(n, d, reps, grid):
    kern = functools.partial(chain_kernel, reps=reps)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
        in_specs=[pl.BlockSpec((n, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def main():
    rng = np.random.default_rng(0)
    n, reps, grid = 1024, 64, 256
    for d in (64, 128):
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32),
                        dtype=jnp.bfloat16)
        w = jnp.asarray((rng.standard_normal((d, d)) / d).astype(np.float32),
                        dtype=jnp.bfloat16)
        bench(f"chain [{n},{d}]@[{d},{d}] x{reps} x{grid}",
              make(n, d, reps, grid), x, w)

    # VPU elementwise: 64- vs 128-lane exp chains
    def vpu_kernel(x_ref, o_ref, *, reps):
        x = x_ref[...]
        for _ in range(reps):
            x = jnp.exp(x * 0.5)
        o_ref[...] = x

    for d in (64, 128):
        x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
        f = pl.pallas_call(
            functools.partial(vpu_kernel, reps=64),
            grid=(256,),
            out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
            in_specs=[pl.BlockSpec((n, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((n, d), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )
        bench(f"exp chain [{n},{d}] x64 x256", f, x)


if __name__ == "__main__":
    main()
