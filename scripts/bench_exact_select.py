"""Exact-select kernel vs approx_max_k at serving shape (real TPU).

Serving shape: B=512 five-second clips -> 22016 chunks of [10, 512],
K=128.  Compares the sort-free exact Pallas kernel against the approx
path it is meant to replace and the XLA exact alternatives.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.ops.kernels.select import exact_topk_chunks

    rng = np.random.default_rng(0)
    Bc, Nt, F, K = 22016, 10, 512, 128
    x = jax.device_put(jnp.asarray(
        np.abs(rng.standard_normal((Bc, Nt, F))).astype(np.float32)))
    x16 = jax.device_put(x.astype(jnp.bfloat16).reshape(Bc, Nt * F))

    def sync(v):
        return float(jnp.sum(jax.tree.leaves(v)[0].astype(jnp.float32)))

    def bench(name, fn, *args, iters=10):
        jf = jax.jit(fn)
        sync(jf(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:48s} {dt*1e3:8.2f} ms", flush=True)
        return out

    # block_c=64/128 crash the Mosaic compiler (array.h limits check) —
    # 32 is the production setting
    for comp in ("gather", "scatter"):
        for bc in (16, 32):
            try:
                bench(f"exact_topk_chunks {comp} block_c={bc}",
                      lambda m, bc=bc, comp=comp: exact_topk_chunks(
                          m, K, block_c=bc, compaction=comp), x)
            except Exception as e:  # keep the sweep alive across compiler bugs
                print(f"exact_topk_chunks {comp} block_c={bc}: "
                      f"FAILED {type(e).__name__}", flush=True)
        try:
            bench(f"exact_topk_chunks {comp} bf16 grid (serving dtype)",
                  lambda m, comp=comp: exact_topk_chunks(
                      m.reshape(Bc, Nt, F), K, compaction=comp), x16)
        except Exception as e:
            print(f"exact_topk_chunks {comp} bf16: FAILED {type(e).__name__}",
                  flush=True)
    bench("approx_max_k bf16 recall 0.9",
          lambda m: jax.lax.approx_max_k(m, K, recall_target=0.9), x16)

    def twostage(m):
        v1, i1 = jax.lax.top_k(m, K)
        flat_i = i1 + jnp.arange(Nt)[None, :, None] * F
        v, i2 = jax.lax.top_k(v1.reshape(Bc, Nt * K), K)
        idx = jnp.take_along_axis(flat_i.reshape(Bc, Nt * K), i2, axis=-1)
        return v, idx
    bench("two-stage exact top_k (current exact path)", twostage, x)

    # parity spot-check on the kernel output
    vals, idx = jax.jit(lambda m: exact_topk_chunks(m, K))(x)
    rv, ri = jax.jit(lambda m: jax.lax.top_k(m.reshape(Bc, Nt * F), K))(x)
    ok = 0
    for i in range(0, Bc, 997):
        ok += set(np.asarray(idx[i]).tolist()) == set(np.asarray(ri[i]).tolist())
    print(f"set parity on {len(range(0, Bc, 997))} sampled chunks: {ok}")

    # bf16-grid parity (serving dtype, 7-mantissa-bit search): top-K SET of
    # the bf16 values == lax.top_k of their exact f32 embedding
    v16, i16 = jax.jit(
        lambda m: exact_topk_chunks(m.reshape(Bc, Nt, F), K))(x16)
    rv16, ri16 = jax.jit(
        lambda m: jax.lax.top_k(m.astype(jnp.float32), K))(x16)
    ok = 0
    for i in range(0, Bc, 997):
        ok += set(np.asarray(i16[i]).tolist()) == \
            set(np.asarray(ri16[i]).tolist())
    print(f"bf16 set parity on {len(range(0, Bc, 997))} sampled chunks: {ok}")


if __name__ == "__main__":
    main()
