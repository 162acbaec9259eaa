"""Round 2 selection shootout: PartialReduce + small exact finish."""
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
        out = jf(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jf(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
        return out

    for L in (256, 512, 1024):
        out = bench(
            f"approx aggregate=False override L={L}",
            lambda m, L=L: jax.lax.approx_max_k(
                m, K, recall_target=0.99, aggregate_to_topk=False,
                reduction_input_size_override=L * 40),
            x16)
        print("   shape:", out[0].shape, flush=True)

    for L in (256, 512, 1280):
        c = jax.device_put(jnp.asarray(
            rng.standard_normal((Bc, L)).astype(np.float32)))
        bench(f"exact top_k on [{Bc}, {L}] k=128 f32",
              lambda m: jax.lax.top_k(m, K), c)
        c16 = jax.device_put(c.astype(jnp.bfloat16))
        bench(f"exact top_k on [{Bc}, {L}] k=128 bf16",
              lambda m: jax.lax.top_k(m, K), c16)

    # full composition: reduce then finish, with index mapping
    def composed(m):
        v1, i1 = jax.lax.approx_max_k(
            m, K, recall_target=0.99, aggregate_to_topk=False)
        v, i2 = jax.lax.top_k(v1, K)
        idx = jnp.take_along_axis(i1, i2, axis=-1)
        return v, idx
    bench("composed: PartialReduce + topk(L) + remap", composed, x16)

    def composed_sorted(m):
        v1, i1 = jax.lax.approx_max_k(
            m, K, recall_target=0.95, aggregate_to_topk=False)
        v, i2 = jax.lax.top_k(v1, K)
        idx = jnp.take_along_axis(i1, i2, axis=-1)
        return v, idx
    bench("composed recall 0.95", composed_sorted, x16)


if __name__ == "__main__":
    main()
