"""Probe: can the v6 attend stages run int8 END-TO-END inside the kernel —
in-kernel f32→int8 quantization (round + convert), int8 dot_general with
int32 accumulation, f32 dequant — and what does the full quantized attend
cost vs the bf16 one at the REAL serving shapes?

Shapes (one pair, v6): MAB0 logits [2hm=1024, dv2=128]×[K=128, dv2]ᵀ,
MAB0 av [1024, 128]×[128, 128]; MAB1 lgT [m=64,dv2]×[2hK=2048,dv2]ᵀ,
MAB1 av [2048, 64]ᵀ×[64, 128].  P pairs unrolled like the kernel does.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P = 8          # pairs per grid step (block_b=16)
    K = 128
    dv2 = 128
    h, m = 8, 64
    rows0 = 2 * h * m          # 1024

    def quant(x):
        """f32 [n, d] → (int8 values, f32 scale scalar)."""
        s = jnp.max(jnp.abs(x)) * (1.0 / 127.0) + 1e-30
        xq = jnp.round(x * (1.0 / s)).astype(jnp.int8)
        return xq, s

    def make_kernel(mode):
        def kern(iq_ref, k_ref, o_ref):
            iq = iq_ref[...]            # [rows0, dv2] f32 (static queries)
            acc = jnp.zeros((rows0, dv2), jnp.float32)
            for p in range(P):
                k_p = k_ref[p * K:(p + 1) * K]            # [K, dv2] f32
                if mode == "int8":
                    iq8, s_q = quant(iq)
                    k8, s_k = quant(k_p)
                    lg = jax.lax.dot_general(
                        iq8, k8,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (s_q * s_k * 0.125)
                    pexp = jnp.exp(jnp.clip(lg, -50.0, 50.0))
                    a = pexp / jnp.sum(pexp, axis=-1, keepdims=True)
                    a8 = jnp.round(a * 127.0).astype(jnp.int8)
                    v8, s_v = quant(k_p)
                    av = jax.lax.dot_general(
                        a8, v8,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (s_v / 127.0)
                else:
                    lg = jax.lax.dot_general(
                        iq.astype(jnp.bfloat16), k_p.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * 0.125
                    pexp = jnp.exp(jnp.clip(lg, -50.0, 50.0))
                    a = pexp / jnp.sum(pexp, axis=-1, keepdims=True)
                    av = jnp.dot(a.astype(jnp.bfloat16),
                                 k_p.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)
                acc = acc + av
            o_ref[...] = acc
        return kern

    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.normal(0, 1.5, (rows0, dv2)).astype(np.float32))
    kmat = jnp.asarray(rng.normal(0, 1.2, (P * K, dv2)).astype(np.float32))

    outs = {}
    for mode in ("bf16", "int8"):
        try:
            f = jax.jit(lambda iq, kmat, mode=mode: pl.pallas_call(
                make_kernel(mode),
                grid=(512,),
                out_shape=jax.ShapeDtypeStruct((rows0, dv2), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(iq, kmat))
            o = f(iq, kmat)
            o.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(5):
                o = f(iq, kmat)
            o.block_until_ready()
            dt = (time.perf_counter() - t0) / 5
            outs[mode] = np.asarray(o)
            n_attends = 512 * P
            print(f"{mode}: {dt*1e3:7.2f} ms   {dt/n_attends*1e6:.3f} µs/attend",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)

    if len(outs) == 2:
        ref, q = outs["bf16"], outs["int8"]
        rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"int8 vs bf16: max rel err {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
