"""Serving throughput INCLUDING host ingest (real TPU).

Generates a synthetic WAV corpus (5 s, 44.1 kHz, 16-bit PCM — ESC-50
shaped, pcaudio.data.synthetic), then times
``AudioClassifier.classify_paths`` end-to-end: native C++ prefetch decode
→ H2D (double-buffered) → fused pipeline → logits on host.  This is the
production number next to bench.py's device-only headline.

Usage: python scripts/bench_serving_ingest.py [--nclips 2048] [--batch 512]
"""
import argparse
import os
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nclips", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--topk", type=int, default=128)
    ap.add_argument("--keep-dir", default=None)
    args = ap.parse_args()

    fs = 44100
    n = int(args.seconds * fs)
    rng = np.random.default_rng(0)

    from pcaudio.data.synthetic import synth_clip, write_wav_pcm16

    tmp = args.keep_dir or tempfile.mkdtemp(prefix="pcaudio_corpus_")
    os.makedirs(tmp, exist_ok=True)
    # small pool of distinct signals, many files (decode cost is per file)
    t0 = time.perf_counter()
    paths = []
    for i in range(args.nclips):
        p = os.path.join(tmp, f"clip_{i:05d}.wav")
        if not (os.path.exists(p) and os.path.getsize(p) == 44 + 2 * n):
            write_wav_pcm16(p, synth_clip(i % 10, i // 10, n=n), fs)
        paths.append(p)
    print(f"corpus: {args.nclips} clips in {tmp} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    import jax
    import jax.numpy as jnp

    from pcaudio import native
    from pcaudio.eval.pipeline import TemporalPipelineConfig
    from pcaudio.nn import ST
    from pcaudio.serve import AudioClassifier

    print("native ingest available:", native.available(), flush=True)

    model = ST(dim_input=3, num_outputs=1, dim_output=10,
               num_inds=64, dim_hidden=64, num_heads=8, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 16, 3)))
    pipe = TemporalPipelineConfig(
        fs=fs, n_fft=1024, num_frames=10, top_k=args.topk,
        extraction="exact", featurize="fused",
        stft_precision="default", compute_dtype="bfloat16")

    ref_labels = None
    for wd in ("float32", "int16"):
        clf = AudioClassifier(model=model, params=params, pipeline=pipe,
                              batch_size=args.batch,
                              buffer_len=(n + 1023) // 1024 * 1024,
                              wave_dtype=wd)
        # warmup/compile on one batch
        t0 = time.perf_counter()
        clf.classify_paths(paths[: args.batch])
        print(f"[{wd}] compile+first batch: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        labels, probs = clf.classify_paths(paths)
        dt = time.perf_counter() - t0
        print(f"[{wd}] end-to-end WITH ingest: {args.nclips} clips in "
              f"{dt:.2f}s = {args.nclips/dt:.0f} clips/sec", flush=True)
        if ref_labels is None:
            ref_labels = labels
        else:
            agree = float(np.mean(ref_labels == labels))
            print(f"[{wd}] classification agreement vs float32: {agree:.4f}",
                  flush=True)

    # decode-only pass for attribution (zero-copy slot protocol, int16)
    from pcaudio.native import PrefetchingLoader

    t0 = time.perf_counter()
    tot = 0
    with PrefetchingLoader((n + 1023) // 1024 * 1024, args.batch, depth=3,
                           dtype=np.int16) as pf:
        groups = [paths[i: i + args.batch]
                  for i in range(0, len(paths), args.batch)]
        for g in groups[: min(3, len(groups))]:
            pf.submit(g)
        for gi in range(len(groups)):
            w, l, n_ = pf.next()
            tot += n_
            if gi + 3 < len(groups):
                pf.submit(groups[gi + 3])
    dt_dec = time.perf_counter() - t0
    print(f"decode-only (int16 slots): {tot} clips in {dt_dec:.2f}s = "
          f"{tot/dt_dec:.0f} clips/sec", flush=True)


if __name__ == "__main__":
    main()
