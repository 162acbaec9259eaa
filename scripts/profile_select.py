"""Selection-op shootout on [22016, 5120] (real TPU)."""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    Bc, N, K = 22016, 5120, 128
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((Bc, N)).astype(np.float32)))
    x16 = jax.device_put(x.astype(jnp.bfloat16))

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
        print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
        return jf(*args)

    bench("approx_max_k bf16 (aggregate=True)",
          lambda m: jax.lax.approx_max_k(m, K, recall_target=0.99), x16)
    bench("approx_max_k bf16 aggregate_to_topk=False",
          lambda m: jax.lax.approx_max_k(m, K, recall_target=0.99,
                                         aggregate_to_topk=False), x16)
    out = jax.jit(lambda m: jax.lax.approx_max_k(
        m, K, recall_target=0.99, aggregate_to_topk=False))(x16)
    print("  candidate count:", out[0].shape, flush=True)
    L = out[0].shape[-1]
    cand = jax.device_put(out[0])

    bench(f"exact top_k on candidates [{L}]",
          lambda c: jax.lax.top_k(c, K), cand)
    bench("sort full row (baseline)", lambda m: jax.lax.sort(m), x16)
    # variable-k: does a smaller recall help
    bench("approx_max_k bf16 recall 0.95",
          lambda m: jax.lax.approx_max_k(m, K, recall_target=0.95), x16)
    # top_k on f32 reshaped per-frame (512 wide, 10x rows)
    bench("top_k [220160, 512] k=128 f32",
          lambda m: jax.lax.top_k(m.reshape(Bc * 10, 512), K), x)
    # threshold-count in XLA: 32-pass binary search on uint32 bits
    def threshold(m):
        u = jax.lax.bitcast_convert_type(m, jnp.uint32)
        lo = jnp.zeros((Bc,), jnp.uint32)
        def body(i, lo):
            mid = lo | (jnp.uint32(1) << (31 - i))
            cnt = jnp.sum((u >= mid[:, None]).astype(jnp.int32), axis=-1)
            return jnp.where(cnt >= K, mid, lo)
        return jax.lax.fori_loop(0, 32, body, lo)
    bench("XLA 32-pass threshold binary search", threshold, x)


if __name__ == "__main__":
    main()
