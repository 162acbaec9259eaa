"""Probe: does batching G clips per featurize grid step amortize per-step
overhead?

The featurize kernel's measured DFT+I/O floor is ~15 µs/clip at B=1024
(one clip per grid step) while the DFT matmuls alone account for ~5 µs —
if the difference is fixed per-STEP cost (launch, DMA setup, iota builds),
processing G clips per step should shrink it.  This probe runs the
DFT-only core (matmul + square + static out write) at G ∈ {1, 2, 4, 8}
in two forms: per-clip unrolled dots, and one stacked [G·R−1, hop] dot
whose clip-seam rows are skipped by the per-clip output slices.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x[..., :8].astype(jnp.float32)))


def bench(name, fn, *args, iters=10):
    jf = jax.jit(fn)
    try:
        sync(jf(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt*1e3:8.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:40s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


def main():
    B, L = 1024, 220672
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

    def make(kern, G):
        return pl.pallas_call(
            kern,
            grid=(B // G,),
            in_specs=[
                pl.BlockSpec((G, R, hop), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, C, Nt, F), lambda c: (c, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, C, Nt, F), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )

    for G in (1, 2, 4, 8):
        def k_unroll(x_ref, w0_ref, w1_ref, out_ref, G=G):
            for g in range(G):
                x = x_ref[g].astype(jnp.bfloat16)
                reim = (jnp.dot(x[: R - 1], w0_ref[...],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(x[1:], w1_ref[...],
                                  preferred_element_type=jnp.float32))
                m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2
                out_ref[g] = m2[: C * Nt].reshape(C, Nt, F
                                                  ).astype(jnp.bfloat16)

        bench(f"G={G} unrolled per-clip dots", make(k_unroll, G),
              x3, w0, w1)

        if G > 1:
            def k_stack(x_ref, w0_ref, w1_ref, out_ref, G=G):
                xs = x_ref[...].reshape(G * R, hop).astype(jnp.bfloat16)
                reim = (jnp.dot(xs[: G * R - 1], w0_ref[...],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(xs[1:], w1_ref[...],
                                  preferred_element_type=jnp.float32))
                m2 = reim[:, :F] ** 2 + reim[:, F:] ** 2  # [G·R−1, F]
                for g in range(G):
                    out_ref[g] = m2[g * R: g * R + C * Nt].reshape(
                        C, Nt, F).astype(jnp.bfloat16)

            bench(f"G={G} one stacked dot", make(k_stack, G),
                  x3, w0, w1)


if __name__ == "__main__":
    main()
