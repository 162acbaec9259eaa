"""Probe: fused featurize kernel grid semantics — "arbitrary" (sequential)
vs "parallel" (megacore may split the clip grid across both v5e cores).

The kernel's scratch is fully re-zeroed/rewritten every grid step, so the
steps are independent and "parallel" is legal; this measures what it buys
and asserts bit-identical outputs.
"""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.ops.kernels.featurize import fused_chunk_mag2

    B, L = 512, 220672
    rng = np.random.default_rng(0)
    waves = jax.device_put(jnp.asarray(
        (0.1 * rng.standard_normal((B, L))).astype(np.float32)))
    lengths = jax.device_put(jnp.full((B,), 220500, jnp.int32))

    def sync(o):
        return float(jnp.sum(o[0].astype(jnp.float32)))

    outs = {}
    for sem in ("arbitrary", "parallel"):
        os.environ["PCAUDIO_FEATURIZE_SEMANTICS"] = sem

        def run(w, ln):
            return fused_chunk_mag2(w, ln)

        jf = jax.jit(run)
        t0 = time.perf_counter()
        outs[sem] = jf(waves, lengths)
        sync(outs[sem])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            o = jf(waves, lengths)
        sync(o)
        dt = (time.perf_counter() - t0) / 10
        print(f"{sem:10s} {dt*1e3:8.2f} ms  (compile {compile_s:.1f}s)",
              flush=True)

    same = bool(jnp.all(outs["arbitrary"][0] == outs["parallel"][0])) and \
        bool(jnp.all(outs["arbitrary"][1] == outs["parallel"][1]))
    print("outputs bit-identical:", same, flush=True)


if __name__ == "__main__":
    main()
