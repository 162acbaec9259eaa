"""Wall-time of the full L5 experiment harness on the real chip.

Runs the complete (Fs, N) robustness sweeps (expt1) for the imported FST and
3ST checkpoints on synthetic stand-in audio (no ESC-50 in this image) and
reports wall time — validating that the per-shape jitted-featurizer caching
keeps the harness in minutes, not hours (round-1 review: a fresh jit per
sweep point would cost ~52 compiles x 20-40 s per model).
"""
import glob
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.checkpoint import load_torch_state_dict
    from pcaudio.checkpoint.torch_import import st_params
    from pcaudio.eval.experiments import (framewise_expt1, temporal_expt1,
                                          make_fst_frame_classifier,
                                          make_3st_chunk_classifier)
    from pcaudio.nn import ST

    rng = np.random.default_rng(0)
    B, L = 32, 220672
    waves = np.zeros((B, L), np.float32)
    for i in range(B):
        n = int(rng.integers(L // 2, L))
        t = np.arange(n) / 44100.0
        sig = sum(rng.uniform(0.05, 0.4)
                  * np.sin(2 * np.pi * rng.uniform(80, 8000) * t)
                  for _ in range(3)) + 0.02 * rng.standard_normal(n)
        waves[i, :n] = sig.astype(np.float32)
    labels = rng.integers(0, 10, B)
    wj = jax.device_put(jnp.asarray(waves))
    lj = jax.device_put(jnp.full((B,), L, jnp.int32))
    yj = jax.device_put(jnp.asarray(labels))

    fst_pth = glob.glob("/root/reference/Code/model_saves/FST*net.pth")[0]
    fst = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=64,
             dim_hidden=64, num_heads=8)
    fst_params = st_params(load_torch_state_dict(fst_pth))
    t0 = time.time()
    out = framewise_expt1(make_fst_frame_classifier(fst, fst_params),
                          wj, lj, yj, fsog=44100, Nfft=2048)
    n_pts = sum(len(v) for v in out["data"].values())
    print(f"FST expt1: {n_pts} sweep points in {time.time()-t0:.1f}s",
          flush=True)

    t3_pth = glob.glob("/root/reference/Code/model_saves/3ST*net.pth")[0]
    st3 = ST(dim_input=3, num_outputs=1, dim_output=10, num_inds=64,
             dim_hidden=64, num_heads=8)
    t3_params = st_params(load_torch_state_dict(t3_pth))
    t0 = time.time()
    out = temporal_expt1(make_3st_chunk_classifier(st3, t3_params),
                         wj, lj, yj, fsog=44100, Nfft=1024)
    n_pts = sum(len(v) for v in out["data"].values())
    print(f"3ST expt1: {n_pts} sweep points in {time.time()-t0:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
