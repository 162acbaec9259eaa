"""On-chip probe: does the TPU-default fused-attention TRAINING path learn?

The fused-vs-XLA convergence-agreement test runs in interpret mode on CPU;
this drives both paths on the real chip over an easy synthetic framewise
task and prints the loss curves side by side.  A path stuck at ln(10)
means the chip lowering of that path is broken for training.
"""
import time

import numpy as np


def main():
    import os as _os
    import jax
    if _os.environ.get("PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pcaudio.core.config import ExperimentConfig, ARCH_FST
    from pcaudio.train.recipes import build_trainer
    from pcaudio.train.step import TrainState, make_train_step

    cfg = ExperimentConfig(architecture=ARCH_FST, classes=10,
                           learning_rate=1e-3, weight_decay=1e-3,
                           dhidden=64, nheads=8, ninds=64)

    # easy separable task: class k = gaussian bump at bin region k
    rng = np.random.default_rng(0)
    B, N = (128 if __import__("os").environ.get("PROBE_CPU") == "1" else 512), 1025
    labels = rng.integers(0, 10, B)
    farr = np.linspace(0, 0.5, N, dtype=np.float32)
    mags = rng.normal(-8.0, 0.3, (B, N)).astype(np.float32)
    for i, c in enumerate(labels):
        lo = 50 + c * 90
        mags[i, lo: lo + 60] += 6.0
    pts = np.stack([np.broadcast_to(farr, (B, N)), mags],
                   axis=-1).astype(np.float32)

    batch = {"points": jnp.asarray(pts),
             "labels": jnp.asarray(labels.astype(np.int32))}
    key = jax.random.key(1)

    for fused in ((False, True) if _os.environ.get("PROBE_CPU") != "1" else (False,)):
        model, apply_fn, opt = build_trainer(cfg, fused_attn=fused)
        params = model.init(jax.random.key(0), jnp.zeros((1, 16, 2)))
        state = TrainState.create(params, opt)
        step = jax.jit(make_train_step(apply_fn, opt))
        curve = []
        t0 = time.perf_counter()
        for it in range(300):
            state, metrics = step(state, batch, key)
            if it % 50 == 0 or it == 299:
                curve.append((it, float(metrics["loss"]),
                              float(metrics["accuracy"])))
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        print(f"fused={fused}: {dt:.1f}s  "
              + "  ".join(f"it{i}:L={l:.3f}/a={a:.2f}" for i, l, a in curve),
              flush=True)


if __name__ == "__main__":
    main()
