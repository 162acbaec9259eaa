"""FST training-step throughput: XLA attention vs fused (custom-VJP) Pallas
attention (real TPU).

Reference config being trained: ``Code/settransformer.py`` — batch 128
clouds x 1025 points, ST(dh=64, heads=8, inds=64), CE loss, torch-Adam optax
chain.  Round-1 XLA baseline: 22.9 ms/step.
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

    from pcaudio.nn import ST
    from pcaudio.train.optim import adam_l2
    from pcaudio.train.step import TrainState, make_train_step, jit_train_step

    rng = np.random.default_rng(0)
    B, N = args.batch, args.points
    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, 2)).astype(np.float32)))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, B)))

    import os

    for fused, form in ((False, "-"), (True, "bd_q"), (True, "auto")):
        if fused:
            os.environ["PCAUDIO_TRAIN_ATTEND_FORM"] = form
        model = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=64,
                   dim_hidden=64, num_heads=8, dtype=jnp.bfloat16,
                   fused_attn=fused)
        params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
        opt = adam_l2(1e-3, weight_decay=1e-3)
        state = TrainState.create(params, opt)

        def apply_fn(p, batch, _rng):
            return model.apply(p, batch["points"])

        step = jit_train_step(make_train_step(apply_fn, opt),
                              donate_state=False)
        batch = {"points": pts, "labels": labels}
        rng_key = jax.random.key(1)
        t0 = time.perf_counter()
        state2, metrics = step(state, batch, rng_key)
        float(metrics["loss"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = state
        for _ in range(args.iters):
            s, metrics = step(s, batch, rng_key)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"fused_attn={fused} form={form}: {dt*1e3:.2f} ms/step "
              f"({B/dt:.0f} clouds/s, compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
