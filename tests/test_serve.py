"""Serving wrapper: reference-checkpoint load + ragged batched classify."""
import glob
import os

import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")

from pcaudio.serve import AudioClassifier

REF = "/root/reference/Code/model_saves"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_serve_from_reference_checkpoint():
    cfg = sorted(glob.glob(os.path.join(REF, "3ST*_config.json")))[-1]
    pth = sorted(glob.glob(os.path.join(REF, "3ST*_net.pth")))[-1]
    clf = AudioClassifier.from_reference_checkpoint(
        cfg, pth, top_k=64, batch_size=3, buffer_len=32768)
    rng = np.random.default_rng(0)
    clips = [0.1 * rng.standard_normal(n).astype(np.float32)
             for n in (30000, 20000, 15000, 8000)]  # ragged, crosses buckets
    labels, probs = clf.classify(clips)
    assert labels.shape == (4,) and probs.shape == (4, 10)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # bucket padding must not change results
    l2, p2 = clf.classify(clips[:1])
    np.testing.assert_allclose(p2[0], probs[0], atol=1e-5)


def test_mog_plotting(tmp_path):
    import jax
    from pcaudio.eval.plots import plot_clustering_batch
    from pcaudio.tasks.clustering import sample_mog

    X, labels, pi, (mu, sigma) = sample_mog(jax.random.key(0), 4, 100, 3)
    out = str(tmp_path / "mog.png")
    plot_clustering_batch(X, labels, mu, sigma, out_path=out)
    assert os.path.getsize(out) > 5000


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_classify_paths_overlapped(tmp_path):
    import wave as wavemod

    cfg = sorted(glob.glob(os.path.join(REF, "3ST*_config.json")))[-1]
    pth = sorted(glob.glob(os.path.join(REF, "3ST*_net.pth")))[-1]
    clf = AudioClassifier.from_reference_checkpoint(
        cfg, pth, top_k=64, batch_size=2, buffer_len=32768)
    rng = np.random.default_rng(0)
    paths, clips = [], []
    for i in range(5):
        x = (0.1 * rng.standard_normal(20000 + 1000 * i)).astype(np.float32)
        p = str(tmp_path / f"c{i}.wav")
        with wavemod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes((x * 32767).astype("<i2").tobytes())
        paths.append(p)
        clips.append(x)
    labels, probs = clf.classify_paths(paths)
    assert labels.shape == (5,)
    # matches the in-memory path (modulo int16 quantization of the files)
    l2, p2 = clf.classify(
        [(c * 32767).astype(np.int16).astype(np.float32) / 32768
         for c in clips])
    np.testing.assert_array_equal(labels, l2)
    np.testing.assert_allclose(probs, p2, atol=1e-4)


def test_classify_paths_int16_staging(tmp_path):
    """wave_dtype="int16" (PCM16 H2D staging + on-device /32768) must
    produce identical classifications and logits to f32 staging."""
    import wave as wavemod

    cfg = sorted(glob.glob(os.path.join(REF, "3ST*_config.json")))[-1]
    pth = sorted(glob.glob(os.path.join(REF, "3ST*_net.pth")))[-1]
    rng = np.random.default_rng(1)
    paths = []
    for i in range(5):
        x = (0.1 * rng.standard_normal(20000 + 500 * i)).astype(np.float32)
        p = str(tmp_path / f"s{i}.wav")
        with wavemod.open(p, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes((x * 32767).astype("<i2").tobytes())
        paths.append(p)
    outs = {}
    for dt in ("float32", "int16"):
        clf = AudioClassifier.from_reference_checkpoint(
            cfg, pth, top_k=64, batch_size=2, buffer_len=32768,
            wave_dtype=dt)
        outs[dt] = clf.classify_paths(paths)
    np.testing.assert_array_equal(outs["float32"][0], outs["int16"][0])
    np.testing.assert_allclose(outs["float32"][1], outs["int16"][1],
                               atol=1e-6)
