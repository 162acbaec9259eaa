"""Data layer: seed-compatible tt_split vs reference golden, CSV loader,
WAV decode round-trip."""
import os
import wave

import numpy as np

from pcaudio.data.esc import ESC10_CATEGORIES, load_esc, tt_split
from pcaudio.data.audio_io import load_wav, load_wav_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "split.npz")


def test_tt_split_matches_reference_rng():
    z = np.load(GOLDEN)
    paths = np.array([f"clip_{i:03d}.wav" for i in range(40)])
    labels = np.array([i % 4 for i in range(40)])
    for seed in (1, 5, 42):
        np.random.seed(seed)
        tr, ltr, te, lte = tt_split(paths, labels, f=0.8)
        np.testing.assert_array_equal(np.array(tr), z[f"s{seed}_train"])
        np.testing.assert_array_equal(np.array(ltr), z[f"s{seed}_ltrain"])
        np.testing.assert_array_equal(np.array(te), z[f"s{seed}_test"])
        np.testing.assert_array_equal(np.array(lte), z[f"s{seed}_ltest"])


def test_load_esc(tmp_path):
    csv_path = tmp_path / "esc50.csv"
    rows = ["filename,fold,target,category,esc10,src_file,take"]
    cats = ["dog", "siren", "rain", "chainsaw", "piano"]
    for i, c in enumerate(cats * 2):
        rows.append(f"f{i}.wav,1,{i},{c},True,x,a")
    csv_path.write_text("\n".join(rows))
    paths, labels = load_esc(str(csv_path), "/audio/", ["rain", "dog"])
    # rows in CSV order: dog(0), rain(2), dog(5), rain(7)
    assert list(paths) == ["/audio/f0.wav", "/audio/f2.wav",
                           "/audio/f5.wav", "/audio/f7.wav"]
    assert list(labels) == [1, 0, 1, 0]  # remapped to list order (rain=0, dog=1)
    assert len(ESC10_CATEGORIES) == 10


def test_wav_roundtrip(tmp_path):
    sr = 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(4410) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    y, got_sr = load_wav(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1.0 / 16000)
    batch, lengths = load_wav_batch([p, p], 8192)
    assert batch.shape == (2, 8192) and list(lengths) == [4410, 4410]
    np.testing.assert_allclose(batch[0, :4410], y)


def test_synthetic_corpus_deterministic_and_loadable(tmp_path):
    """The synthetic ESC-shaped corpus is byte-deterministic and flows
    through the reference-compatible loader/split."""
    from pcaudio.data.synthetic import generate_esc_corpus, synth_clip

    d = str(tmp_path / "c")
    csvp, adir = generate_esc_corpus(d, clips_per_class=5)
    waves, lengths, labels = __import__(
        "pcaudio.data.esc", fromlist=["load_esc_split_waves"]
    ).load_esc_split_waves(csvp, adir, 1, split="test")
    assert waves.shape[0] == 10 and (lengths == 220500).all()
    assert sorted(np.bincount(labels).tolist()) == [1] * 10
    # determinism: same (seed, cls, idx) → identical samples
    np.testing.assert_array_equal(synth_clip(3, 2, n=4096),
                                  synth_clip(3, 2, n=4096))
    # class separation: distinct classes produce distinct spectra
    a, b = synth_clip(0, 0, n=44100), synth_clip(9, 0, n=44100)
    fa = np.abs(np.fft.rfft(a))
    fb = np.abs(np.fft.rfft(b))
    assert np.argmax(fa) != np.argmax(fb)
