"""DSP parity tests: JAX trim/STFT/resample vs independent numpy references
implementing the documented librosa-0.8 conventions (librosa itself is not in
the image; SURVEY.md §7 hard part 1 says chase tolerance, not bit-exactness).

Convention provenance — each decision below is pinned to the librosa 0.8.0
source location that defines it (audited against the 0.8.0 release; the
library itself cannot be installed in-image, so these cites are the
verification record the numpy references were written against):

STFT (``librosa/core/spectrum.py::stft``), as invoked at
``/root/reference/Code/settransformer.py:49``:
  - centering: input reflect-padded by ``n_fft//2`` on both sides
    (``center=True`` default, ``pad_mode='reflect'`` default) —
    ``np_stft_logmag`` line ``xp = np.pad(x, n_fft//2, mode="reflect")``.
  - window: ``scipy.signal.get_window(window, win_length, fftbins=True)``
    then ``util.pad_center(window, n_fft)`` — a *periodic* Hann, zero-padded
    symmetrically (left pad ``(n_fft-win_length)//2``) when
    ``win_length < n_fft``.  The reference sweeps ``win_length=N`` with
    ``n_fft=2^ceil(log2 N)`` (``Code/pceval.py:76``), so the centered-pad
    convention is load-bearing for expt 1.
  - framing: ``util.frame`` — ``1 + (len(xp) - n_fft)//hop`` frames, stride
    ``hop``; rfft over the windowed frame, no per-frame normalization
    (the reference divides by ``Nfft`` *outside* librosa,
    ``Code/settransformer.py:49``).

trim (``librosa/effects.py::trim`` → ``_signal_to_frame_nonsilent``), as
invoked at ``Code/settransformer.py:48`` (``top_db=60`` explicit; frame
defaults ``frame_length=2048, hop_length=512``):
  - power envelope: ``feature.rms(y, frame_length, hop_length, center=True,
    pad_mode='reflect')**2`` — mean-square per frame of the reflect-padded
    signal (``np_trim_bounds`` mirrors this).
  - dB: ``core.power_to_db(mse, ref=np.max, top_db=None)`` =
    ``10*log10(max(mse, amin)) - 10*log10(max(ref, amin))`` with
    ``amin=1e-10``; non-silent ⇔ ``db > -top_db``.  Constant/all-zero clips
    have every frame at 0 dB ⇒ nothing trimmed (``test_trim_all_silent``).
  - bounds mapping: ``frames_to_samples`` — start ``= nonzero[0]*hop``, end
    ``= min(len(y), (nonzero[-1]+1)*hop)`` (start is NOT clamped by the
    left reflect pad; frame indices are pad-relative but sample mapping is
    hop-aligned into the unpadded signal).

resample (``librosa/core/audio.py::resample`` with
``res_type='kaiser_fast', scale=True``, ``Code/pceval.py:75``):
  - output length: ``int(np.ceil(n * target_sr / orig_sr))``
    (``test_resample_length_static``).
  - delegates to ``resampy.resample`` — polyphase windowed-sinc
    interpolation with the precomputed ``kaiser_fast`` filter
    (``resampy/filters.py``: 16 zero-crossings, 512 samples/crossing
    precision, rolloff 0.85, Kaiser window) evaluated at fractional
    sample phases with linear interpolation between table entries;
    ``pcaudio/dsp/resample.py`` re-derives the taps analytically from the
    same (zeros, rolloff, beta) parameterization rather than shipping the
    table, hence tolerance-based tests (SNR, energy) not bit goldens.
  - ``scale=True``: output multiplied by ``1/sqrt(ratio)`` — total-energy
    (not amplitude) preservation (``test_resample_energy_scale``).
"""
import numpy as np
import pytest
import scipy.signal

import jax
import jax.numpy as jnp

from pcaudio.dsp import (
    FeaturizeConfig,
    featurize_batch,
    resample,
    resample_length,
    stft_logmag,
    temporal_chunks,
    trim_bounds,
)


# ---------- numpy references (librosa-0.8 conventions) ----------

def np_stft_logmag(x, n_fft, hop, win_length=None, floor=1e-8):
    win_length = win_length or n_fft
    w = scipy.signal.get_window("hann", win_length, fftbins=True)
    lpad = (n_fft - win_length) // 2
    w = np.pad(w, (lpad, n_fft - win_length - lpad))
    xp = np.pad(x, n_fft // 2, mode="reflect")
    T = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[t * hop: t * hop + n_fft] for t in range(T)])
    spec = np.fft.rfft(frames * w, axis=-1) / n_fft
    return np.log(floor + np.abs(spec))


def np_trim_bounds(x, top_db=60.0, fl=2048, hop=512):
    xp = np.pad(x, fl // 2, mode="reflect")
    T = 1 + (len(xp) - fl) // hop
    mse = np.array([np.mean(xp[t * hop: t * hop + fl] ** 2) for t in range(T)])
    db = 10 * np.log10(np.maximum(mse, 1e-10) / max(mse.max(), 1e-10))
    ns = np.nonzero(db > -top_db)[0]
    if len(ns) == 0:
        return 0, 0
    start = ns[0] * hop
    end = min(len(x), (ns[-1] + 1) * hop)
    return start, end - start


def buf(x, L):
    out = np.zeros(L, np.float32)
    out[: len(x)] = x
    return out


# ---------- STFT ----------

@pytest.mark.parametrize("n,n_fft,win", [(40000, 2048, None), (30011, 1024, None),
                                         (40000, 4096, 3000), (8192, 2048, 204)])
def test_stft_matches_numpy(n, n_fft, win):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    hop = n_fft // 2
    ref = np_stft_logmag(x, n_fft, hop, win)
    L = 65536
    got, mask = jax.jit(
        lambda w, l: stft_logmag(w, l, n_fft=n_fft, hop_length=hop, win_length=win)
    )(buf(x, L), n)
    got, mask = np.asarray(got), np.asarray(mask)
    assert mask.sum() == ref.shape[0]
    np.testing.assert_allclose(got[: ref.shape[0]], ref, atol=5e-4, rtol=0)


def test_stft_sine_peak_bin():
    """A pure tone lands in the right bin with Hann mainlobe leakage only."""
    fs, f0, n_fft = 44100, 4306.640625, 2048  # exactly bin 200
    t = np.arange(fs, dtype=np.float32) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    lm, mask = stft_logmag(jnp.asarray(buf(x, 65536)), 44100, n_fft=2048)
    lm = np.asarray(lm)[np.asarray(mask)]
    assert (np.argmax(lm[5:-5], axis=-1) == 200).all()


# ---------- trim ----------

def test_trim_matches_numpy():
    rng = np.random.default_rng(1)
    fs = 44100
    sil = np.zeros(10000, np.float32)
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(30000) / fs)).astype(np.float32)
    noise = (1e-5 * rng.standard_normal(8000)).astype(np.float32)
    x = np.concatenate([sil, noise, tone, sil])
    ref_start, ref_len = np_trim_bounds(x)
    L = 65536
    start, tlen = jax.jit(lambda w, l: trim_bounds(w, l))(buf(x, L), len(x))
    assert (int(start), int(tlen)) == (ref_start, ref_len)


def test_trim_all_silent():
    # librosa semantics: dB is relative to the max frame, so a constant
    # (all-zero) clip has every frame at 0 dB > -top_db → nothing trimmed.
    start, tlen = trim_bounds(jnp.zeros(4096), 4096)
    assert (int(start), int(tlen)) == (0, 4096)


def test_trim_no_silence():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(20000).astype(np.float32)
    ref_start, ref_len = np_trim_bounds(x)
    start, tlen = trim_bounds(jnp.asarray(buf(x, 32768)), 20000)
    assert (int(start), int(tlen)) == (ref_start, ref_len)


# ---------- resample ----------

@pytest.mark.parametrize("target", [22050, 11025, 32000])
def test_resample_sine_fidelity(target):
    """Band-limited tone survives resampling: frequency preserved, SNR high."""
    fs, f0 = 44100, 1000.0
    n = 44100
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    L = 49152
    y, ylen = jax.jit(
        lambda w, l: resample(w, l, fs, target, scale=False)
    )(jnp.asarray(buf(x, L)), n)
    y = np.asarray(y)
    ylen = int(ylen)
    assert ylen == -(-n * target // fs)
    ideal = np.sin(2 * np.pi * f0 * np.arange(ylen) / target)
    m = slice(100, ylen - 100)  # ignore filter edge transients
    err = y[m] - ideal[m]
    snr = 10 * np.log10(np.mean(ideal[m] ** 2) / np.mean(err ** 2))
    assert snr > 45.0, f"SNR {snr:.1f} dB too low for {target}"


def test_resample_energy_scale():
    """librosa scale=True approximately preserves total energy."""
    rng = np.random.default_rng(3)
    n, fs, target = 44100, 44100, 22050
    # band-limit the noise to below the target Nyquist
    x = scipy.signal.sosfilt(
        scipy.signal.butter(8, 0.35, output="sos"), rng.standard_normal(n)
    ).astype(np.float32)
    y, ylen = resample(jnp.asarray(buf(x, 49152)), n, fs, target, scale=True)
    y = np.asarray(y)
    e_in, e_out = float(np.sum(x**2)), float(np.sum(y**2))
    assert abs(e_out / e_in - 1.0) < 0.05


def test_resample_identity():
    x = jnp.asarray(np.random.default_rng(4).standard_normal(1000).astype(np.float32))
    y, ylen = resample(x, 1000, 44100, 44100)
    assert int(ylen) == 1000
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


# ---------- featurize + temporal chunks ----------

def test_featurize_batch_jit():
    rng = np.random.default_rng(5)
    B, L = 3, 32768
    waves = rng.standard_normal((B, L)).astype(np.float32) * 0.1
    lengths = np.array([32768, 20000, 5000])
    cfg = FeaturizeConfig(fs=44100, n_fft=1024, trim=False)
    lm, mask = jax.jit(lambda w, l: featurize_batch(w, l, cfg))(waves, lengths)
    assert lm.shape == (B, 1 + L // 512, 513)
    np.testing.assert_array_equal(
        np.asarray(mask).sum(-1), 1 + lengths // 512
    )


def test_temporal_chunks():
    t_max, F, Nt = 67, 513, 10
    lm = jnp.arange(t_max * F, dtype=jnp.float32).reshape(t_max, F)
    fm = jnp.arange(t_max) < 47
    chunks, cm = temporal_chunks(lm, fm, Nt)
    assert chunks.shape == (6, 10, 512)
    # 47 valid frames -> 4 full chunks (reference drops the remainder,
    # Code/settransformertemp.py:54-59)
    np.testing.assert_array_equal(np.asarray(cm), [True] * 4 + [False] * 2)
    np.testing.assert_allclose(
        np.asarray(chunks[0, 0]), np.asarray(lm[0, :512])
    )


def test_resample_length_static():
    assert resample_length(44100, 44100, 22050) == 22050
    assert resample_length(44101, 44100, 22050) == 22051


def test_resample_long_clip_no_overflow():
    """5-second ESC-50-sized buffers must not overflow int32 time indices
    (regression: i*orig_sr at 220k samples exceeds 2^31)."""
    fs, target, n = 44100, 22050, 220500
    x = np.sin(2 * np.pi * 440 * np.arange(n) / fs).astype(np.float32)
    y, ylen = resample(jnp.asarray(buf(x, 220672)), n, fs, target, scale=False)
    y, ylen = np.asarray(y), int(ylen)
    assert ylen == 110250
    ideal = np.sin(2 * np.pi * 440 * np.arange(ylen) / target)
    m = slice(100, ylen - 100)
    snr = 10 * np.log10(np.mean(ideal[m] ** 2) / np.mean((y[m] - ideal[m]) ** 2))
    assert snr > 45.0
