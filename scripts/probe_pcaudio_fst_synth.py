"""pcaudio side of the reference-parity training probe: same saved clouds,
same recipe (Adam lr 1e-3 wd 1e-3, CE, batch 128), loss curve printed.
Run on the chip (default backend) or CPU (PROBE_CPU=1).
"""
import os
import sys
import time

import numpy as np


def main():
    import jax
    if os.environ.get("PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pcaudio.train.recipes import RECIPES, build_trainer
    from pcaudio.train.step import TrainState, make_train_step

    d = np.load("/tmp/fst_clouds.npz")
    X, y = d["X"], d["y"]
    print("clouds:", X.shape, flush=True)

    cfg = RECIPES["FST"]()
    model, apply_fn, opt = build_trainer(cfg)
    params = model.init(jax.random.key(cfg.torch_seed), jnp.asarray(X[:1]))
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(apply_fn, opt))
    key = jax.random.key(1)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    for it in range(steps):
        idx = rng.integers(0, len(X), 128)
        batch = {"points": jnp.asarray(X[idx]),
                 "labels": jnp.asarray(y[idx].astype(np.int32))}
        state, m = step(state, batch, key)
        if it % 25 == 0 or it == steps - 1:
            print(f"it{it}: L={float(m['loss']):.3f} "
                  f"a={float(m['accuracy']):.2f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
