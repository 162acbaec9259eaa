"""Isolate fused_chunk_mag2 kernel cost: matmul vs scratch dance vs switch.

Builds stripped-down kernel variants to find where the 47 ms goes.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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
    n_fft, hop, Nt = 1024, 512, 10
    F = n_fft // 2
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    R = L // hop
    C = (1 + R) // Nt
    x3 = waves.reshape(B, R, hop)
    w0 = jax.device_put(jnp.asarray(
        rng.standard_normal((hop, 2 * F)).astype(np.float32),
        dtype=jnp.bfloat16))
    w1 = jax.device_put(jnp.asarray(
        rng.standard_normal((hop, 2 * F)).astype(np.float32),
        dtype=jnp.bfloat16))
    s0 = jax.device_put(jnp.asarray(rng.integers(0, 40, B), jnp.int32))

    def make(kern, scratch=True, block_c=1):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // block_c,),
            in_specs=[
                pl.BlockSpec((block_c, R, hop), lambda c, s: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_c, C, Nt, F),
                                   lambda c, s: (c, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=(
                [pltpu.VMEM((R + C * Nt + 24, F), jnp.float32)]
                if scratch else []),
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, C, Nt, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    # v0: matmul + square only, direct static write to out
    def k_matmul(s_ref, x_ref, w0_ref, w1_ref, out_ref):
        x = x_ref[0].astype(jnp.bfloat16)
        reim = (jnp.dot(x[: R - 1], w0_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(x[1:], w1_ref[...],
                          preferred_element_type=jnp.float32))
        m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
        out_ref[0] = m2[: C * Nt].reshape(C, Nt, F).astype(jnp.bfloat16)

    bench("v0 matmul+sq only (bf16 in)", make(k_matmul, scratch=False),
          s0, x3, w0, w1)

    # v0f: same but f32 input conversion in kernel
    def k_matmul_f(s_ref, x_ref, w0_ref, w1_ref, out_ref):
        x = x_ref[0].astype(jnp.float32).astype(jnp.bfloat16)
        reim = (jnp.dot(x[: R - 1], w0_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(x[1:], w1_ref[...],
                          preferred_element_type=jnp.float32))
        m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
        out_ref[0] = m2[: C * Nt].reshape(C, Nt, F).astype(jnp.bfloat16)

    bench("v0f + f32->bf16 conv", make(k_matmul_f, scratch=False),
          s0, x3, w0, w1)

    # v1: + scratch write + aligned read, NO switch (delta assumed 0)
    def k_scratch(s_ref, x_ref, w0_ref, w1_ref, out_ref, scratch):
        s0v = s_ref[pl.program_id(0)]
        x = x_ref[0].astype(jnp.bfloat16)
        reim = (jnp.dot(x[: R - 1], w0_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(x[1:], w1_ref[...],
                          preferred_element_type=jnp.float32))
        m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
        scratch[8: 8 + R - 1, :] = m2
        u = 7 + s0v
        u_c = pl.multiple_of((u // 8) * 8, 8)
        window = scratch[pl.ds(u_c, C * Nt + 8), :]
        out_ref[0] = window[: C * Nt].reshape(C, Nt, F).astype(jnp.bfloat16)

    bench("v1 + scratch+aligned read", make(k_scratch), s0, x3, w0, w1)

    # v2: + full zero init + 8-way switch (the current kernel shape)
    def k_full(s_ref, x_ref, w0_ref, w1_ref, out_ref, scratch):
        s0v = s_ref[pl.program_id(0)]
        x = x_ref[0].astype(jnp.bfloat16)
        reim = (jnp.dot(x[: R - 1], w0_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(x[1:], w1_ref[...],
                          preferred_element_type=jnp.float32))
        m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
        scratch[...] = jnp.zeros(scratch.shape, scratch.dtype)
        scratch[8: 8 + R - 1, :] = m2
        u = 7 + s0v
        u_c = pl.multiple_of((u // 8) * 8, 8)
        delta = u - u_c
        window = scratch[pl.ds(u_c, C * Nt + 8), :]
        frames = jax.lax.switch(
            delta,
            [lambda w=window, d=d: w[d: d + C * Nt] for d in range(8)])
        out_ref[0] = frames.reshape(C, Nt, F).astype(jnp.bfloat16)

    bench("v2 + zeroinit + switch (≈current)", make(k_full), s0, x3, w0, w1)

    # v3: switch replaced by weighted add of two shifted windows? try
    # dynamic lane... skip; instead: switch over 8 but with no zero init
    def k_nozero(s_ref, x_ref, w0_ref, w1_ref, out_ref, scratch):
        s0v = s_ref[pl.program_id(0)]
        x = x_ref[0].astype(jnp.bfloat16)
        reim = (jnp.dot(x[: R - 1], w0_ref[...],
                        preferred_element_type=jnp.float32)
                + jnp.dot(x[1:], w1_ref[...],
                          preferred_element_type=jnp.float32))
        m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
        scratch[8: 8 + R - 1, :] = m2
        u = 7 + s0v
        u_c = pl.multiple_of((u // 8) * 8, 8)
        delta = u - u_c
        window = scratch[pl.ds(u_c, C * Nt + 8), :]
        frames = jax.lax.switch(
            delta,
            [lambda w=window, d=d: w[d: d + C * Nt] for d in range(8)])
        out_ref[0] = frames.reshape(C, Nt, F).astype(jnp.bfloat16)

    bench("v3 switch, no zero-init", make(k_nozero), s0, x3, w0, w1)


if __name__ == "__main__":
    main()
