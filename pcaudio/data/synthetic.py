"""Deterministic synthetic ESC-shaped WAV corpus.

ESC-50 audio is not redistributable with this repo, so the end-to-end
harness (train → eval sweeps → plots, ``pcaudio.cli``) is exercised at real
scale on a generated stand-in corpus with the exact on-disk shape the
reference pipeline consumes (``Code/data_processing.py:8-38``): an
``esc50.csv`` metadata file plus 5-second 44.1 kHz 16-bit PCM mono WAVs,
40 clips per ESC-10 class, 5 folds.  Every byte is a pure function of the
seed.  Each class gets a distinct spectral signature (class-dependent
partial stack + AM envelope + noise floor) so models genuinely learn; the
corpus swaps for the real ESC-50 by changing two CLI flags
(docs/ACCURACY.md).
"""
from __future__ import annotations

import os
import struct
from typing import Sequence, Tuple

import numpy as np

from pcaudio.data.esc import ESC10_CATEGORIES

FS = 44100
CLIP_SECONDS = 5.0


def write_wav_pcm16(path: str, x: np.ndarray, fs: int = FS) -> None:
    """Minimal 16-bit PCM mono WAV writer (no external deps)."""
    pcm = np.clip(np.asarray(x, np.float32) * 32767.0,
                  -32768, 32767).astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, fs, fs * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


def synth_clip(cls: int, idx: int, seed: int = 0,
               n: int = int(FS * CLIP_SECONDS), fs: int = FS) -> np.ndarray:
    """One deterministic clip: class-dependent partials + AM + noise.

    Class signature: fundamental 110·(1+cls/3) Hz with 3 partials whose
    relative amplitudes rotate with the class, a class-rate amplitude
    envelope, and a broadband noise floor 18 dB down.  Per-clip variation
    (phase, detune, envelope offset, noise) comes from a counter-based RNG
    on (seed, cls, idx) — stable across processes and platforms.
    """
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, cls, idx]))
    t = np.arange(n, dtype=np.float64) / fs
    f0 = 110.0 * (1.0 + cls / 3.0) * (1.0 + 0.02 * rng.standard_normal())
    x = np.zeros(n)
    for p in range(1, 4):
        amp = 1.0 / (1 + ((p + cls) % 3))
        x += amp * np.sin(2 * np.pi * f0 * p * t + rng.uniform(0, 2 * np.pi))
    env_rate = 1.0 + 0.5 * cls
    env = 0.55 + 0.45 * np.sin(2 * np.pi * env_rate * t + rng.uniform(0, 2 * np.pi))
    x = x * env + 0.125 * rng.standard_normal(n)
    x *= 0.25 / np.max(np.abs(x))
    return x.astype(np.float32)


def generate_esc_corpus(
    out_dir: str,
    clips_per_class: int = 40,
    categories: Sequence[str] = ESC10_CATEGORIES,
    seed: int = 0,
    clip_seconds: float = CLIP_SECONDS,
) -> Tuple[str, str]:
    """Write the corpus; returns ``(csv_path, audio_dir)`` ready for the
    ``--esc-csv`` / ``--esc-audio`` CLI flags.  Idempotent: existing files
    with the right size are kept (regeneration is a no-op)."""
    audio_dir = os.path.join(out_dir, "audio") + os.sep
    os.makedirs(audio_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "esc50.csv")
    n = int(FS * clip_seconds)
    rows = []
    for ci, cat in enumerate(categories):
        for idx in range(clips_per_class):
            fold = 1 + idx % 5
            fname = f"{fold}-{100000 + ci * 1000 + idx}-A-{ci}.wav"
            fpath = os.path.join(audio_dir, fname)
            expect = 44 + 2 * n
            if not (os.path.exists(fpath) and os.path.getsize(fpath) == expect):
                write_wav_pcm16(fpath, synth_clip(ci, idx, seed, n=n))
            rows.append((fname, fold, cat))
    with open(csv_path, "w") as f:
        f.write("filename,fold,target,category,esc10,src_file,take\n")
        for fname, fold, cat in rows:
            f.write(f"{fname},{fold},0,{cat},True,0,A\n")
    return csv_path, audio_dir
