"""Attribute the FST training step (reference recipe shape: batch 128 x 1025
points, ``Code/settransformer.py:96-108``) into forward / backward / optimizer
/ attention shares, to bound the payoff of the one remaining training lever —
a whole-ST backward kernel (the monolithic fused-ST kernel is forward-only).

Stages measured on the real chip, all best-of-R wall times on committed
results:

  step      full jitted train step (value_and_grad + torch-Adam update)
  vg        value_and_grad only (no optimizer update)
  fwd       forward + loss only (no grad)
  attn      the 5 fused-MHA calls of the model (ISAB x2 = 4 MABs + PMA) at
            the recipe shapes, forward only, one jitted program
  attn_vg   same 5 calls under value_and_grad (custom-VJP backward)

Derived:  backward = vg - fwd;  adam = step - vg;  non-attention forward =
fwd - attn;  non-attention fwd+bwd = vg - attn_vg.  A monolithic whole-ST
forward+backward kernel can at most eliminate the non-attention HBM traffic
and dispatch seams — its payoff is bounded by (vg - attn_vg) plus scheduling
overlap, since the attention math itself is already in custom-VJP Pallas
kernels at their measured floor.
"""
import json
import time

import numpy as np


def _sync(x):
    """True sync on the tunneled axon platform: ``block_until_ready`` can
    return before remote execution finishes (bench.py:38), and timing with
    it here produced self-contradictory stage numbers (a chained full train
    step reading 0.6 ms while its own value_and_grad read 41 ms).  Fetching
    a scalar reduction of the last output is a real barrier: the device
    queue is in-order, so it drains every prior dispatch too."""
    import jax.numpy as jnp

    leaves = [l for l in __import__("jax").tree.leaves(x)
              if hasattr(l, "dtype")]
    return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves[:1]))


def timeit(fn, *args, iters=20, warmup=1):
    """bench.py's methodology: pipelined loop of iters dispatches, one
    scalar-fetch sync at the end, best-of-3."""
    for _ in range(warmup):
        _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.nn import ST
    from pcaudio.train.optim import adam_l2
    from pcaudio.train.step import TrainState, make_train_step

    B, N, m, dh, h = 128, 1025, 64, 64, 8
    rng = np.random.default_rng(0)
    pts = jax.device_put(jnp.asarray(
        rng.standard_normal((B, N, 2)).astype(np.float32)))
    labels = jax.device_put(jnp.asarray(rng.integers(0, 10, B)))

    model = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=m,
               dim_hidden=dh, num_heads=h, dtype=jnp.bfloat16,
               fused_attn=True)
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 2)))
    opt = adam_l2(1e-3, weight_decay=1e-3)
    state = TrainState.create(params, opt)
    batch = {"points": pts, "labels": labels}
    key = jax.random.key(1)

    def apply_fn(p, b, _rng):
        return model.apply(p, b["points"])

    step = jax.jit(make_train_step(apply_fn, opt))

    import optax

    def loss_fn(p):
        logits = apply_fn(p, batch, None)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    fwd = jax.jit(loss_fn)

    # --- attention-only programs at the model's 5 MAB shapes -------------
    # ISAB mab0: queries m=64, kv N=1025 (x2); ISAB mab1: queries N, kv m
    # (x2); PMA: queries 1, kv N.  All dim_V=64, 8 heads, bf16 — identical
    # to what MAB passes fused_mha (pcaudio/nn/attention.py:119-131).
    from pcaudio.ops.kernels.mha import fused_mha
    scale = 1.0 / np.sqrt(dh)
    k = jax.random.key(2)
    mk = lambda *s: jax.random.normal(jax.random.split(k, 1)[0], s,
                                      jnp.bfloat16)
    q_m, kv_n = mk(B, m, dh), mk(B, N, dh)
    q_n, kv_m = mk(B, N, dh), mk(B, m, dh)
    q_1 = mk(B, 1, dh)

    def attn_chain(q_m, kv_n, q_n, kv_m, q_1):
        a = fused_mha(q_m, kv_n, kv_n, None, num_heads=h, scale=scale)
        b = fused_mha(q_n, kv_m, kv_m, None, num_heads=h, scale=scale)
        c = fused_mha(q_m, kv_n, kv_n, None, num_heads=h, scale=scale)
        d = fused_mha(q_n, kv_m, kv_m, None, num_heads=h, scale=scale)
        e = fused_mha(q_1, kv_n, kv_n, None, num_heads=h, scale=scale)
        return (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
                + c.astype(jnp.float32).sum() + d.astype(jnp.float32).sum()
                + e.astype(jnp.float32).sum())

    attn_fwd = jax.jit(attn_chain)
    attn_vg = jax.jit(jax.grad(attn_chain, argnums=(0, 1, 2, 3, 4)))

    def chained_steps(iters):
        # chain state through iterations (true data dependency, same as
        # scripts/bench_train_step.py) — independent same-arg dispatches
        # measured ~1 ms/step, an artifact, not a real step time
        s = state
        for _ in range(iters):
            s, metrics = step(s, batch, key)
        return s

    t = {}
    # dispatch/RTT floor: a trivial program, timed the same way
    null = jax.jit(lambda x: x + 1.0)
    xnull = jax.device_put(jnp.zeros((8, 128), jnp.float32))
    t["null_ms"] = timeit(lambda: null(xnull))
    # chained step rate — matches scripts/bench_train_step.py exactly
    _sync(chained_steps(2).params)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = chained_steps(20)
        _sync(s.params)
        best = min(best, (time.perf_counter() - t0) / 20)
    t["step_chained_ms"] = best * 1e3
    t["step_ms"] = timeit(lambda: step(state, batch, key))
    t["vg_ms"] = timeit(lambda: vg(state.params))
    t["fwd_ms"] = timeit(lambda: fwd(state.params))
    t["attn_fwd_ms"] = timeit(lambda: attn_fwd(q_m, kv_n, q_n, kv_m, q_1))
    t["attn_vg_ms"] = timeit(lambda: attn_vg(q_m, kv_n, q_n, kv_m, q_1))

    t["backward_ms"] = round(t["vg_ms"] - t["fwd_ms"], 3)
    t["adam_ms"] = round(t["step_ms"] - t["vg_ms"], 3)
    t["non_attn_fwd_ms"] = round(t["fwd_ms"] - t["attn_fwd_ms"], 3)
    t["non_attn_fwdbwd_ms"] = round(t["vg_ms"] - t["attn_vg_ms"], 3)
    for k2 in ("null_ms", "step_chained_ms", "step_ms", "vg_ms", "fwd_ms",
               "attn_fwd_ms", "attn_vg_ms"):
        t[k2] = round(t[k2], 3)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
