"""Probe: int8 MXU matmuls inside Pallas on this Mosaic toolchain.

The v6 fused-ST kernel's attend matmuls run at ~90% MXU efficiency on
their issued bf16 MACs (scripts/profile_st_stages.py) — the only lever
left is the int8 MXU path (2x bf16 throughput on v5e).  This probes (a)
whether jnp.dot on int8 operands with int32 accumulation lowers at all,
and (b) its throughput vs bf16 at the attend shape.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # correctness: small int8 dot
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.integers(-127, 127, (128, 128)).astype(np.int8))
    B = jnp.asarray(rng.integers(-127, 127, (128, 128)).astype(np.int8))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(A, B)
    ref = np.asarray(A, np.int32) @ np.asarray(B, np.int32)
    err = np.abs(np.asarray(out) - ref).max()
    print(f"int8 dot 128x128: max|err| = {err}", flush=True)

    # peak probe: [1024, 512] x [512, 512] (4 contraction passes, 4 lane
    # tiles — weight loads amortized over 1024-row streams)
    reps = 16

    def make_big(dt, acc):
        def k3(a_ref, b_ref, o_ref):
            acc_v = jnp.zeros((1024, 512), acc)
            b = b_ref[...]
            for i in range(reps):
                a = a_ref[8 * i: 8 * i + 1024]
                acc_v = acc_v + jax.lax.dot_general(
                    a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
            o_ref[...] = acc_v.astype(jnp.float32)
        return k3

    for dt, acc, name in ((jnp.int8, jnp.int32, "int8 big"),
                          (jnp.bfloat16, jnp.float32, "bf16 big")):
        a = jnp.asarray(rng.integers(-4, 4, (1024 + 8 * reps, 512))).astype(dt)
        b = jnp.asarray(rng.integers(-4, 4, (512, 512))).astype(dt)
        try:
            f = jax.jit(lambda a, b, dt=dt, acc=acc: pl.pallas_call(
                make_big(dt, acc),
                grid=(256,),
                out_shape=jax.ShapeDtypeStruct((1024, 512), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(a, b))
            float(jnp.sum(f(a, b)))
            t0 = time.perf_counter()
            for _ in range(5):
                o = f(a, b)
            float(jnp.sum(o))
            dtm = (time.perf_counter() - t0) / 5
            macs = 256 * reps * 1024 * 512 * 512
            print(f"{name}: {dtm*1e3:7.2f} ms  "
                  f"{macs/dtm/1e12:.1f} TMAC/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)

    # throughput at the attend shape: [1024, 128] x [128, 128], looped
    reps = 64

    def make(dt, acc):
        def k2(a_ref, b_ref, o_ref):
            acc_v = jnp.zeros((1024, 128), acc)
            b = b_ref[...]
            for i in range(reps):
                # de-CSE: each dot reads a distinct 8-aligned window (int8
                # elementwise ops don't lower — "Only vector<i16>/<i32>")
                a = a_ref[8 * i: 8 * i + 1024]
                acc_v = acc_v + jax.lax.dot_general(
                    a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
            o_ref[...] = acc_v.astype(jnp.float32)
        return k2

    for dt, acc, name in ((jnp.int8, jnp.int32, "int8"),
                          (jnp.bfloat16, jnp.float32, "bf16")):
        a = jnp.asarray(rng.integers(-4, 4, (1024 + 8 * reps, 128))).astype(dt)
        b = jnp.asarray(rng.integers(-4, 4, (128, 128))).astype(dt)
        try:
            f = jax.jit(lambda a, b, dt=dt, acc=acc: pl.pallas_call(
                make(dt, acc),
                grid=(256,),
                out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(a, b))
            float(jnp.sum(f(a, b)))
            t0 = time.perf_counter()
            for _ in range(5):
                o = f(a, b)
            float(jnp.sum(o))
            dtm = (time.perf_counter() - t0) / 5
            macs = 256 * reps * 1024 * 128 * 128
            print(f"{name}: {dtm*1e3:7.2f} ms  "
                  f"{macs/dtm/1e12:.1f} TMAC/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
