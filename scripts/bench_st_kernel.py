"""Micro-benchmark: fused-ST kernel variants at serving shapes (real TPU).

Usage: python scripts/bench_st_kernel.py [v2|v4|xla ...] [--nchunks N] [--k K]
       [--block-b BB]
"""
import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["v4", "v6"])
    ap.add_argument("--nchunks", type=int, default=5504)
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--block-b", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcaudio.nn import ST

    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))

    rng = np.random.default_rng(0)
    B, K = args.nchunks, args.k
    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((B, K, 3)).astype(np.float32)))
    mask = jax.device_put(jnp.ones((B, K), bool))

    def sync(x):
        return float(jnp.sum(x))

    for name in args.variants or ["v4", "v6"]:
        if name in ("v4", "v6", "fused", "v6nomask"):
            from pcaudio.ops.kernels.fused_st import fused_st_forward as f
            variant = "v6" if name == "v6nomask" else name
            nomask = name == "v6nomask"  # the serving e2e path (mask=None)
            fn = jax.jit(lambda p, x, m, v=variant, nm=nomask: f(
                p, x, None if nm else m, num_heads=8,
                block_b=args.block_b, variant=v))
        else:
            fn = jax.jit(lambda p, x, m: model.apply(p, x, mask=m))
        t0 = time.perf_counter()
        sync(fn(params, pts, mask))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(params, pts, mask)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:.2f} ms/batch  {dt/B*1e6:.2f} us/chunk  "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
