"""Training-step stage attribution at the FST recipe shape (real TPU).

Times forward-only, value_and_grad (fwd+bwd), and the full train step
(fwd+bwd+torch-Adam optax) for both attention paths (XLA vs the fused
custom-VJP Pallas kernels) at the reference training config (B=128 clouds
x 1025 points, ST dh=64 h=8 m=64, bf16 matmuls).  Sizes the remaining
training-side kernel opportunity: step - vag = optimizer/update cost,
vag - fwd = backward cost.
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--points", type=int, default=1025)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pcaudio.nn import ST
    from pcaudio.train.optim import adam_l2
    from pcaudio.train.step import TrainState, make_train_step

    rng = np.random.default_rng(0)
    B, N = args.batch, args.points
    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, 2)).astype(np.float32)))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, B)))
    key = jax.random.key(1)

    def timed(name, f, *a):
        # NOTE: jax.block_until_ready does not actually block through the
        # axon tunnel — force a D2H read of one leaf instead.
        def sync(o):
            leaf = jax.tree.leaves(o)[0]
            return float(jnp.sum(leaf.astype(jnp.float32)))
        sync(f(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"  {name:24s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    for fused in (False, True):
        print(f"fused_attn={fused}", flush=True)
        model = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=64,
                   dim_hidden=64, num_heads=8, dtype=jnp.bfloat16,
                   fused_attn=fused)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
        opt = adam_l2(1e-3, weight_decay=1e-3)
        state = TrainState.create(params, opt)

        def apply_fn(p, batch, _rng):
            return model.apply(p, batch["points"])

        batch = {"points": pts, "labels": labels}

        fwd = jax.jit(lambda p: model.apply(p, pts))
        timed("forward", fwd, params)

        def loss_fn(p):
            logits = model.apply(p, pts)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        vag = jax.jit(jax.value_and_grad(loss_fn))
        timed("value_and_grad", vag, params)

        step = jax.jit(make_train_step(apply_fn, opt))
        timed("train_step", step, state, batch, key)
        jax.clear_caches()


if __name__ == "__main__":
    main()
