"""Probe: does Mosaic lower batched dot_general inside a Pallas kernel?"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(a_ref, b_ref, o_ref):
    a = a_ref[...]
    b = b_ref[...]
    o_ref[...] = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    B, M, K, N = 8, 512, 64, 128
    a = jnp.asarray(rng.standard_normal((B, M, K)).astype(np.float32),
                    dtype=jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((B, K, N)).astype(np.float32),
                    dtype=jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    ref = jax.lax.dot_general(
        a.astype(jnp.float32), b.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))))
    err = float(jnp.max(jnp.abs(out - ref)))
    print("batched dot ok, max err", err, flush=True)


if __name__ == "__main__":
    main()
