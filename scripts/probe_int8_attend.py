"""Probe: can the v6 attend stages run int8 END-TO-END inside the kernel —
in-kernel f32→int8 quantization (round + convert), int8 dot_general with
int32 accumulation, f32 dequant — and what does the full quantized attend
cost vs the bf16 one at the REAL serving shapes?

Shape probed (one pair, v6 MAB0): logits [2hm=1024, dv2=128]×[K=128, dv2]ᵀ
then av [1024, K=128]×[K, dv2].  The static queries (iq_bd) are quantized
OUTSIDE the loop (in the real kernel they are host-precomputed weights);
k/v are quantized in-kernel per pair, exactly what the production kernel
would have to do.  Grid steps read distinct windows (program_id indexing)
so Mosaic cannot CSE the work away.

MEASURED RESULT (v5e, 2026-08, docs/PERFORMANCE.md): int8 LOSES —
1.282 µs/attend vs bf16's 1.099.  The int8 dots themselves are ~1.32x
faster at this shape (probe_int8_matmul.py), but the unavoidable
in-kernel quantize/dequant elementwise passes (k/v max-reduce + round +
convert, and above all round(a·127) over the [1024, K] softmax output
for the AV matmul) cost more than the MXU saves.  int8 attends only pay
if quantization is amortized OUT of the attend (e.g. fused into the
projection epilogues) AND the probability quantization for AV is
avoided — at which point only the logits matmul is int8 (~5% of the
attend, not worth the accuracy asterisk).

Timing note: on the axon tunnel backend ``block_until_ready`` returns
before the device work completes — time N dispatches and force ONE
scalar readback (``float(jnp.sum(o))``) to flush the queue, as every
bench in this repo does.
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
    GRID = 1024

    def quant(x):
        """f32 [n, d] → (int8 values, f32 scale scalar)."""
        s = jnp.max(jnp.abs(x)) * (1.0 / 127.0) + 1e-30
        xq = jnp.round(x * (1.0 / s)).astype(jnp.int8)
        return xq, s

    def make_kernel(mode):
        def kern(iq_ref, k_ref, o_ref):
            g = pl.program_id(0)
            acc = jnp.zeros((rows0, dv2), jnp.float32)
            if mode == "int8":
                iq8, s_q = quant(iq_ref[...])   # loop-invariant (hoistable)
            else:
                iqb = iq_ref[...].astype(jnp.bfloat16)
            for p in range(P):
                off = (g % P) * K + p * K
                k_p = k_ref[pl.ds(off, K), :]
                if mode == "int8":
                    k8, s_k = quant(k_p)
                    lg = jax.lax.dot_general(
                        iq8, k8,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (s_q * s_k * 0.125)
                    pexp = jnp.exp(jnp.clip(lg, -50.0, 50.0))
                    a = pexp / jnp.sum(pexp, axis=-1, keepdims=True)
                    a8 = jnp.round(a * 127.0).astype(jnp.int8)
                    av = jax.lax.dot_general(
                        a8, k8,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * (s_k / 127.0)
                else:
                    kb = k_p.astype(jnp.bfloat16)
                    lg = jax.lax.dot_general(
                        iqb, kb,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * 0.125
                    pexp = jnp.exp(jnp.clip(lg, -50.0, 50.0))
                    a = pexp / jnp.sum(pexp, axis=-1, keepdims=True)
                    av = jnp.dot(a.astype(jnp.bfloat16), kb,
                                 preferred_element_type=jnp.float32)
                acc = acc + av

            @pl.when(g == 0)
            def _():
                o_ref[...] = jnp.zeros_like(o_ref)

            o_ref[...] += acc   # keep every grid step's work live (no DCE)
        return kern

    rng = np.random.default_rng(0)
    iq = jnp.asarray(rng.normal(0, 1.5, (rows0, dv2)).astype(np.float32))
    kmat = jnp.asarray(rng.normal(0, 1.2, (2 * P * K, dv2)).astype(np.float32))

    outs = {}
    for mode in ("bf16", "int8"):
        try:
            f = jax.jit(lambda iq, kmat, mode=mode: pl.pallas_call(
                make_kernel(mode),
                grid=(GRID,),
                out_shape=jax.ShapeDtypeStruct((rows0, dv2), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(iq, kmat))
            float(jnp.sum(f(iq, kmat)))   # warmup + real sync
            t0 = time.perf_counter()
            for _ in range(5):
                o = f(iq, kmat)
            float(jnp.sum(o))             # ONE readback flushes the queue
            dt = (time.perf_counter() - t0) / 5
            outs[mode] = np.asarray(o)
            n_attends = GRID * P
            print(f"{mode}: {dt*1e3:7.2f} ms   "
                  f"{dt/n_attends*1e6:.3f} µs/attend", flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)

    if len(outs) == 2:
        ref, q = outs["bf16"], outs["int8"]
        rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"int8 vs bf16: max rel err {rel:.4f}", flush=True)


if __name__ == "__main__":
    main()
