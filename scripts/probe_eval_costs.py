"""Attribute one expt1 sweep point's wall time: featurize compile, featurize
run, classifier compile, classifier run — and the same for one expt2 K point.
Decides where the eval-harness speedup must come from (round-4 task 2).
"""
import glob
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pcaudio.checkpoint import load_torch_state_dict
    from pcaudio.checkpoint.torch_import import st_params
    from pcaudio.dsp.featurize import featurize_batch
    from pcaudio.eval.experiments import (
        sweep_featurize_config, _valid_frames, make_fst_frame_classifier,
        _MB_FRAMES)
    from pcaudio.ops.cloud import freq_coords, frame_cloud
    from pcaudio.ops.subsample import rand_k_points
    from pcaudio.nn import ST

    rng = np.random.default_rng(0)
    B, L = 80, 220672  # ~test-set size of the 400-clip cycle corpus
    waves = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    wj = jax.device_put(jnp.asarray(waves))
    lj = jax.device_put(jnp.full((B,), L, jnp.int32))

    fst_pth = glob.glob("/root/reference/Code/model_saves/FST*net.pth")[0]
    fst = ST(dim_input=2, num_outputs=1, dim_output=10, num_inds=64,
             dim_hidden=64, num_heads=8)
    params = st_params(load_torch_state_dict(fst_pth))
    clf = make_fst_frame_classifier(fst, params)

    # --- one expt1 sweep point (F=32000, N=1843 -> resample + n_fft 2048)
    cfg = sweep_featurize_config(32000, 1843, fsog=44100, hf=0.5, tDb=60.0)
    jf = jax.jit(featurize_batch, static_argnames=("cfg",))
    t0 = time.perf_counter()
    lowered = jf.lower(wj, lj, cfg=cfg)
    c = lowered.compile()
    t_feat_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    lm, fm = c(wj, lj)
    jax.block_until_ready(lm)
    t_feat_run = time.perf_counter() - t0

    frames, valid, _ = _valid_frames(lm, fm, jnp.zeros((B,), jnp.int32))
    farr = freq_coords(frames.shape[-1], 32000)
    n = frames.shape[0]
    pad = (-n) % _MB_FRAMES
    fpad = jnp.pad(frames, ((0, pad), (0, 0)))[: _MB_FRAMES]
    jc = jax.jit(clf)
    t0 = time.perf_counter()
    cc = jc.lower(fpad, farr).compile()
    t_clf_compile = time.perf_counter() - t0
    nmb = (n + pad) // _MB_FRAMES
    t0 = time.perf_counter()
    for i in range(nmb):
        out = cc(fpad, farr)
    jax.block_until_ready(out)
    t_clf_run = time.perf_counter() - t0

    print(f"expt1 point: frames={n} bins={frames.shape[-1]} microbatches={nmb}")
    print(f"  featurize compile {t_feat_compile:.1f}s run {t_feat_run*1e3:.0f}ms")
    print(f"  classifier compile {t_clf_compile:.1f}s run(all mb) {t_clf_run*1e3:.0f}ms")

    # --- one expt2 K point (K=451, rand) at training config
    cfg2 = sweep_featurize_config(44100, 2048, fsog=44100, hf=0.5, tDb=60.0)
    lm2, fm2 = jf(wj, lj, cfg=cfg2)
    frames2, valid2, _ = _valid_frames(lm2, fm2, jnp.zeros((B,), jnp.int32))
    farr2 = freq_coords(frames2.shape[-1], 44100)
    clouds = frame_cloud(frames2[: _MB_FRAMES], farr2)
    cloud_clf = lambda pts: fst.apply(params, pts)
    jr = jax.jit(lambda k2, cch, K: cloud_clf(rand_k_points(k2, cch, K)),
                 static_argnums=2)
    key = jax.random.key(0)
    t0 = time.perf_counter()
    cr = jr.lower(key, clouds, 451).compile()
    t_k_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in range(10):
        out = cr(jax.random.fold_in(key, r), clouds)
    jax.block_until_ready(out)
    t_k_run10 = time.perf_counter() - t0
    print(f"expt2 K point (1 mb of {_MB_FRAMES}): compile {t_k_compile:.1f}s "
          f"run x10 {t_k_run10*1e3:.0f}ms")


if __name__ == "__main__":
    main()
